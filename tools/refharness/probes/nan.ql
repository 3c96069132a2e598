Q CREATE (:Nv {k:'nanlc', v:'nan'})
Q CREATE (:Nv {k:'nanmc', v:'NaN'})
Q CREATE (:Nv {k:'pinf', v:'inf'})
Q CREATE (:Nv {k:'ninf', v:'-infinity'})
Q CREATE (:Nv {k:'five', v:'5'})
Q CREATE (:Nv {k:'ofive', v:'05'})
Q CREATE (:Nv {k:'tendot', v:'10.'})
Q CREATE (:Nv {k:'negz', v:'-0'})
Q CREATE (:Nv {k:'zero', v:'0.0'})
Q CREATE (:Nv {k:'hex', v:'0x10'})
Q CREATE (:Nv {k:'j5d', v:'5d'})
Q CREATE (:Nv {k:'arab', v:'١'})
Q CREATE (:Nv {k:'sp5'})
Q CREATE (:Nv {k:'tab5'})
Q MATCH (n:Nv {k:'sp5'}) SET n.v = ' 5'
Q MATCH (n:Nv {k:'tab5'}) SET n.v = '5	'
Q MATCH (n:Nv) WHERE n.v = 'nan' RETURN n.k
Q MATCH (n:Nv) WHERE n.v = 'NaN' RETURN n.k
Q MATCH (n:Nv) WHERE n.v <> 'nan' RETURN n.k
Q MATCH (n:Nv) WHERE n.v < 'nan' RETURN n.k
Q MATCH (n:Nv) WHERE n.v >= 'nan' RETURN n.k
Q MATCH (n:Nv) WHERE n.v < 'inf' RETURN n.k
Q MATCH (n:Nv) WHERE n.v >= '-infinity' RETURN n.k
Q MATCH (n:Nv) WHERE n.v = '+Infinity' RETURN n.k
Q MATCH (n:Nv) WHERE n.v = '5' RETURN n.k
Q MATCH (n:Nv) WHERE n.v <> '5' RETURN n.k
Q MATCH (n:Nv) WHERE n.v = '-0' RETURN n.k
Q MATCH (n:Nv) WHERE n.v < '10.' RETURN n.k
Q MATCH (n:Nv) WHERE n.v >= '1e99999' RETURN n.k
Q MATCH (n:Nv) WHERE n.v > '5d' RETURN n.k
Q MATCH (n:Nv) WHERE n.v >= ' 5' RETURN n.k
Q MATCH (n:Nv) WHERE n.v = '١' RETURN n.k
Q MATCH (n:Nv) WHERE n.v <= '5	' RETURN n.k
Q CREATE (:Ke {k=:'v', =:'w'})
Q MATCH (n:Ke) RETURN n
Q MATCH (n:Ke {k=:'v'}) RETURN n
Q MATCH (n:Ke {k=:'x'}) RETURN n
Q CREATE NODE Ke2 {q=:"w2"}
Q MATCH NODE Ke2
