Q MATCH (b {j:')', k:'-['}) RETURN b
Q MATCH (b {j:')', k:'-[]'}) RETURN b
Q MATCH (b {p:'-['}) RETURN b
Q MATCH (a)-[r:T]->(b {p:'-['}) RETURN a
Q MATCH (a {p:')-['})-[r:T]->(b) RETURN a
Q MATCH (a {p:'-['})-[r:T]->(b) RETURN a
Q MATCH (a {p:']'})-[r:T]->(b) RETURN a
Q MATCH (a)-[r]->(b)-[s]->(c) RETURN a
