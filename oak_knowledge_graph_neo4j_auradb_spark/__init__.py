"""PySpark-native knowledge-graph construction engine.

A brand-new, Spark-first re-expression of the capabilities of
``oaknational/oak-knowledge-graph-neo4j-auradb`` (reference read-only at
``/root/reference``): ingest an interleaved text+media document table
(``doc_id:string, spans:array<struct<kind,text,media_ref,offset>>``),
reconstruct the consolidated curriculum wide table, run the reference's
clean/filter/join semantics declaratively through Catalyst, extract
``(subj, pred, obj)`` triples + typed node tables via a config-driven plan
compiler (reference: ``schema_mapper.py``), link mentions against a
broadcast entity dictionary, canonicalize entities with distributed
connected components, and materialize partitioned node/edge tables.

Everything is pyspark.sql DataFrame + vectorized pandas/Arrow UDFs — no
per-row Python in any hot path.
"""

__version__ = "0.1.0"
