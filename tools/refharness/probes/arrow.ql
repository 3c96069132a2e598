Q CREATE (x:E1 {k:"1"})
Q CREATE (y:E2 {k:"2"})
Q MATCH (a {k:"1"}), (b {k:"2"}) CREATE (a)-[:RE]->(b)
Q MATCH (a)--(b) RETURN a
Q MATCH (a)-->(b) RETURN a
Q MATCH (a)- ->(b) RETURN a
Q MATCH (a), (a)-[r:RE]- >(b:E2) RETURN DISTINCT b.k
Q MATCH (a)-[r:RE]- >(b) RETURN a
Q MATCH (a)-[r:RE]>(b) RETURN a
Q MATCH (a)<-[r:RE]-(b) RETURN b.k
Q MATCH (a)< -[r:RE]-(b) RETURN b.k
