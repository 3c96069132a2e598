Q CREATE (a:X {k:"1"})
P OPTIONAL MATCH (a:X) MERGE (a)-[:R]->(a)other=1
Q MATCH (n)-[r]->(m) RETURN id(r)
P OPTIONAL MATCH (a:X) MERGE (a)-[:S {p:$missing}]->(a)other=1
P OPTIONAL MATCH (z:NOPE) MERGE (z)-[:S {p:$missing}]->(z)other=1
Q MATCH (a:X) CREATE (a)-[r:RR]->(a)
P OPTIONAL MATCH (a:X)-[r:RR]->(b) MERGE (r)-[:X2]->(b)other=1
P OPTIONAL MATCH (a:X)-[r:RR]->(b) MERGE (r)-[:X3 {p:$missing}]->(b)other=1
P OPTIONAL MATCH (a:X)-[r:RR]->(b) CREATE (r)-[q:Q]->(b) RETURN bother=1
P OPTIONAL MATCH (a:X)-[r:RR]->(b) CREATE (r)-[q:Q]->(b)other=1
P OPTIONAL MATCH (a:X)-[r:RR]->(b) CREATE (r)-[q:Q {p:$missing}]->(b)other=1
Q MATCH (n)-[r]->(m) RETURN id(r)
