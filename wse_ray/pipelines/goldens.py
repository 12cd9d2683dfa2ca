"""Pinned-golden oracles for the non-SQL-expressible gates.

These VALUES literals are the sf0.01 outputs of the corresponding Ray
pipelines, generated once and pinned (testdata is driver-generated
deterministically).  They are DETERMINISM/REGRESSION oracles — weaker than
the independent recomputation oracles in oracles.py: the underlying
algorithm semantics (snippet byte behavior, simhash banding, IVF recall)
are verified separately by pytest goldens and property tests; this pin
makes any drift visible to the driver gate as a hash mismatch.

Regenerate (after an INTENTIONAL behavior change only) with
tools/regen_goldens.py.
"""
SNIPPETS_GOLDEN_SF001_COLS = ['query_id', 'rank', 'doc_id', 'snippet']
SNIPPETS_GOLDEN_SF001 = """
(0, 1, 26, ''),
(0, 2, 446, ''),
(0, 3, 457, ''),
(0, 4, 120, ''),
(0, 5, 152, ''),
(1, 1, 134, ''),
(1, 2, 446, ''),
(1, 3, 107, ''),
(1, 4, 383, ''),
(1, 5, 26, 'table small sort order small hash stream data big key group dup...')"""  # 10 rows

SIMHASH_GOLDEN_SF001_COLS = ['a', 'b', 'hamming']
SIMHASH_GOLDEN_SF001 = """
(24, 357, 3),
(31, 383, 1),
(45, 267, 2),
(45, 413, 2),
(58, 293, 1),
(61, 185, 1),
(70, 447, 1),
(72, 377, 3),
(92, 450, 3),
(98, 290, 1),
(107, 387, 3),
(120, 332, 2),
(152, 178, 2),
(267, 413, 0),
(285, 301, 1),
(393, 420, 0),
(458, 462, 2)"""  # 17 rows

ANN_IVF_GOLDEN_SF001_COLS = ['query_id', 'rank', 'vec_id', 'cosine']
ANN_IVF_GOLDEN_SF001 = """
(0, 1, 0, 1.0),
(0, 2, 365, 0.369994),
(0, 3, 334, 0.362722),
(0, 4, 387, 0.331139),
(0, 5, 423, 0.296934),
(0, 6, 73, 0.295434),
(0, 7, 7, 0.292842),
(0, 8, 190, 0.281795),
(0, 9, 464, 0.276628),
(0, 10, 388, 0.276301),
(1, 1, 1, 1.0),
(1, 2, 386, 0.371485),
(1, 3, 27, 0.348208),
(1, 4, 407, 0.32701),
(1, 5, 195, 0.322744),
(1, 6, 64, 0.316374),
(1, 7, 124, 0.30275),
(1, 8, 402, 0.292322),
(1, 9, 472, 0.292109),
(1, 10, 220, 0.289782),
(2, 1, 2, 1.0),
(2, 2, 117, 0.318143),
(2, 3, 450, 0.266344),
(2, 4, 188, 0.263272),
(2, 5, 320, 0.255043),
(2, 6, 418, 0.254029),
(2, 7, 471, 0.247193),
(2, 8, 172, 0.239829),
(2, 9, 197, 0.233149),
(2, 10, 440, 0.231369),
(3, 1, 3, 1.0),
(3, 2, 130, 0.399872),
(3, 3, 149, 0.329934),
(3, 4, 343, 0.308472),
(3, 5, 207, 0.291702),
(3, 6, 192, 0.290803),
(3, 7, 437, 0.280535),
(3, 8, 474, 0.276738),
(3, 9, 363, 0.268615),
(3, 10, 134, 0.250601),
(4, 1, 4, 1.0),
(4, 2, 114, 0.398513),
(4, 3, 408, 0.322753),
(4, 4, 482, 0.313897),
(4, 5, 280, 0.279826),
(4, 6, 249, 0.279631),
(4, 7, 470, 0.252537),
(4, 8, 384, 0.240413),
(4, 9, 346, 0.231564),
(4, 10, 288, 0.228625)"""  # 50 rows

