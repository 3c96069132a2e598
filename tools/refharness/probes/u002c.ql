Q CREATE (:Ec {k:'a\u002cb', g:'g1'})
Q MATCH (n:Ec) RETURN n
Q CREATE (:Ec2 {k:'a\,b'})
Q MATCH (m:Ec2) RETURN m
