"""nous_spark — a from-scratch, PySpark-native knowledge-graph construction
and semantic-memory engine with the query semantics of jwandekoken/nous.

The reference (read-only at /root/reference) is a FastAPI + Postgres/AGE +
Qdrant service that assimilates text into (entity, verb, fact) triples and
answers recall queries. This package re-expresses those semantics as a batch
Spark pipeline over web-page tables:

    pages(url, warc_ts, html, text, lang)
      -> extract_text (Arrow-batched pandas UDF, byte-identical per url)
      -> extract triples + identifier mentions (vectorized rule-based OIE)
      -> entity linking (broadcast alias dictionary + uuid5 anchors)
      -> canonicalization (large-star/small-star connected components)
      -> graph materialization (nodes/identifiers/facts/sources/edges)
      -> recall queries (Spark SQL self-joins over the edges table)

Design rules (see SURVEY.md §7):
  * every stage is a pure ``DataFrame -> DataFrame`` function;
  * no per-row Python on the hot path — pandas/Arrow UDFs only;
  * normalization rules that define triple identity live in exactly one
    module (``nous_spark.normalize``) and are byte-exact to the reference
    (fact_model.py:30-88, fact_model.py:55-57);
  * every sink is idempotent (dedup-key + anti-join before append) so
    stages are resumable.
"""

__version__ = "0.1.0"
