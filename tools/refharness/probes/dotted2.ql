Q CREATE (.a:W {k:"1", u:"5"})
Q CREATE (.b:W {k:"2", u:"3"})
Q MATCH (.a:W) SET .a.k = "9"
Q MATCH (n) RETURN n
Q MATCH (.a:W) WHERE id(.a) < id(.a) RETURN .a
Q MATCH (.a:W), (.b:W) WHERE id(.a) < id(.b) RETURN id(.b)
Q MATCH (.a:W) RETURN .a ORDER BY .a.u
Q MATCH (.a {k:"1"}), (.b {k:"2"}) MERGE (.a)-[:RR]->(.b)
Q MATCH (n) RETURN n
Q MATCH (.a:W) DETACH DELETE .a
Q MATCH (n) RETURN n
