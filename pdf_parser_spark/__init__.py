"""pdf_parser_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the extraction core of the reference
``houbaoshu/pdf_parser`` (a single-process Python PDF -> blocks -> chunks ->
embeddings -> retrieval pipeline), rebuilt Spark-first over tables of
multi-turn conversation / agent transcripts keyed by ``(conv_id, turn_idx)``.

Layout
------
``core/``       pure-Python semantics shared by the Spark UDFs *and* the test
                oracle (tokenizer, boilerplate heuristics, chunk merge).
                One implementation, two consumers — per-turn equality between
                the distributed pipeline and the oracle holds by construction
                for the per-row logic; tests then cover the distributed
                orchestration (offsets, ordering, resume).
``operators/``  Spark DataFrame operators (tokenize, merge, boilerplate
                mining, retrieval, dedup, text stats, similarity search).
``sources/``    synthetic transcript generator, table IO, lineage/resume.
``functions/``  scalar column-expression helpers.
``pipeline.py`` end-to-end extraction pipeline.
``session.py``  tuned SparkSession builder.
"""

__version__ = "0.1.0"
