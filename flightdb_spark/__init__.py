"""flightdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of skypies/flightdb (see SURVEY.md).

Design (Spark-first, not a port):
  - partitioned Parquet ``flights`` / ``trackpoints`` tables instead of
    gob-blob Datastore entities (reference: blob.go:24-36);
  - window-function derived columns instead of Track.PostProcess
    (reference: track.go:187-226);
  - broadcast dimension joins instead of singleton gzip caches
    (reference: ref/airframecache.go:17-44);
  - pandas-UDF geometry for the restrictor entry/exit crawl
    (reference: intersectabletrack.go:147-400);
  - Structured Streaming with custom state for fragment→flight assembly
    (reference: fgae/addtrackfragment.go:36-143);
  - plus LLM-data-pipeline operators (dedup, similarity search, multimodal
    columns, text analysis) designed for 100 TB scale.
"""

__version__ = "0.1.0"
