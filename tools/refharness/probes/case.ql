Q CREATE (:X {k:"1"})
Q CREATE (:Y {k:"2"})
Q MATCH (a {k:"1"}), (b {k:"2"}) CREATE (a)-[:U {ek:"e1"}]->(b)
Q MATCH (a)-[A:U]->(b) RETURN b.k
Q MATCH (a {k:"1"}), (A {k:"2"}) RETURN A.k
Q MATCH (a)-[A:U]->(b) RETURN A.ek
Q MATCH (a)-[A:U]->(b) DELETE r, LIMIT  a
