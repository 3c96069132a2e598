Q CREATE (:Ca {k:'c1', g:'g1'})
Q MATCH (n:Ca {g:'g,1'}) RETURN n
Q MATCH (a)-[r:T {ek:'e,7'}]-(b {g:'g1'}) RETURN b
Q MATCH (a)-[r:T {ek:'e,7'}]->(b) RETURN b
Q CREATE (:Cb {k:'c,2', g:'g1'})
Q CREATE (x:Cc {k:'c3'}), (y:Cc {k:'c4'}), (x)-[:CT {ek:'e,9'}]->(y)
Q MATCH (n) WHERE n.g = 'g,1' RETURN n.k
Q MATCH (a)-[r:T {ek:'e7,'}]-(b) RETURN b
Q MATCH (a)-[r:T {w:'1', ek:'e,7'}]-(b) RETURN b
Q CREATE (:Cd {k:'a,b:c'})
Q MATCH (n:Cd) RETURN n
Q MATCH (n:Cd {b:"c'"}) RETURN n
