"""Custom operators the reference/north star needs that Spark doesn't
ship as single calls: MinHash-LSH / SimHash near-dup, hyperplane-LSH
ANN, as-of join. Each is a composition of built-in DataFrame ops
(SURVEY §2.10 'custom operators' rule (a)) — no Python UDFs, no RDDs."""
