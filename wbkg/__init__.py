"""wbkg — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of the reference
(eriktuck/world-bank-kg, a single-process GraphRAG pipeline) as an
idiomatic Spark DataFrame pipeline:

    documents_interleaved (doc_id, spans[])            [input_hint schema]
      -> chunk    (stage 1, applyInPandas fold;  ref src/parser.py:94-174)
      -> extract  (stage 2, mapInPandas Aho-Corasick + Schwartz-Hearst;
                   ref src/ner.py, src/acronyms.py)
      -> link     (stage 3, broadcast/salted hash join; ref src/linker.py)
      -> canonicalize (stage 4, connected components;  ref src/graph.py:681)
      -> materialize  (stage 5, edges/nodes tables;    ref src/graph.py:665-752)
      -> communities  (stage 6, co-occurrence + label prop; ref src/summarize.py)

Every stage is a DataFrame -> DataFrame function; heavy per-document logic
lives in Arrow-batched pandas UDFs (never per-row Python on the driver).
"""

__version__ = "0.1.0"
