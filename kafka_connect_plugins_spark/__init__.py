"""kafka_connect_plugins_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``cultureamp/kafka-connect-plugins`` (a Kotlin library of Kafka Connect
single-message transforms, see /root/reference) as an idiomatic Spark engine:

- the eight SMT operators become plan-time Column projections / filters over a
  change-event DataFrame (``operators/``),
- partition routing becomes hash repartitioning with skew salting
  (``operators/salted_repartition.py``),
- the implicit downstream upsert-by-key idempotence becomes an explicit
  last-writer-wins dedup + MERGE upsert into a bucketed, snapshot-versioned
  lake table (``plans/lake_table.py``),
- the Connect worker poll loop becomes Structured Streaming ``foreachBatch``
  with exactly-once epoch guards and checkpoint resume (``streaming/``),
- plus the training-data-pipeline operators a 100 TB corpus needs: dedup
  (exact / MinHash-LSH / SimHash), ANN similarity search, text analysis, and
  multimodal binary-column plumbing (``dedup/``, ``sim/``, ``text/``,
  ``multimodal/``).

Everything is public-API PySpark (DataFrame / SQL / Structured Streaming);
no per-row Python in hot paths — native Columns first, Arrow-vectorized
pandas UDFs only where column expressions genuinely cannot express the
semantics.
"""

__version__ = "0.1.0"
