Q CREATE (a:La {k:"a", u:"10"})
Q CREATE (b:La {k:"b", u:"9"})
Q CREATE (c:La {k:"c"})
Q CREATE (d:La {k:"d"})
Q MATCH (n) WITH n  ORDER BY n.u LIMIT 2
Q MATCH (n) WITH n ORDER BY n.u LIMIT 2
Q MATCH (n) RETURN n.k ORDER BY n.u
