Q CREATE (:Tw {g:'g2'})
Q MATCH (n:Tw {g:'g2 '}) RETURN n
Q MATCH (n:Tw {g:'g2'}) RETURN n
Q CREATE (:Tw2 {g:'x '})
Q MATCH (n:Tw2 {g:'x'}) RETURN n
Q MATCH (n:Tw {g:'g2 '}) RETURN n
