"""westtopologies_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing
capabilities of the Institute-Web-Science-and-Technologies/
westTopologies reference (Apache Storm 0.9.1 topologies; see
SURVEY.md), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes),
- broadcast joins for all small side tables,
- stateful streaming via Structured Streaming for the reference's
  data-driven windows,
- Arrow-batched pandas UDFs only where built-ins cannot express the
  semantics (model scoring, stemming).

Layout (SURVEY.md §7.1):
- session.py      SparkSession factory tuned for local[N] and cluster
- schemas.py      StructTypes for the reference's JSON streams
- io/             sources and sinks (S1-S12)
- ops/            relational / window / text / role / geo / model ops
- streaming/      stateful operators (W1 exact, W2 count batches)
- pipelines/      the three reference topologies, assembled
- scale/          large-scale training-data ops (dedup, ANN, text)
"""

__version__ = "0.1.0"
