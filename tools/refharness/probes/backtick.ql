Q CREATE (a`b:BT {k:"1"})
Q MATCH (a`b:BT) RETURN id(a`b)
Q MATCH (n) RETURN n
