"""Operator families (SURVEY.md §2).

warehouse.py   the analytical view twin (J1-J8, A0-A7, window A1)
queries.py     q1-q11 regroupings of the view (O1-O5, F1-F3, CASE ladder)
relational.py  extra relational coverage: TPC-H-style, semi/anti, set ops,
               windows, rollup, group_concat (A8)
procedures.py  stored-routine twins (rewards_report, balance, in-stock)
text.py        text analysis (tokenize, quality, lang, top-terms)
dedup.py       exact + minhash-LSH + simhash + ngram-jaccard dedup
similarity.py  embedding cosine top-k (brute force + LSH)
multimodal.py  binary-column plumbing (decode stubs, size/mime stats)
"""
