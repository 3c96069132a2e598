Q CREATE (.a:P {k:"1"})
Q MATCH (.a) RETURN .a
Q MATCH (.a:P) WHERE .a.k = "1" RETURN .a.k
Q MATCH (x.y:P) RETURN x.y
Q CREATE (a:P {k:"2"})-[:R]->(.b:Q {k:"3"})
Q MATCH (n) RETURN n
