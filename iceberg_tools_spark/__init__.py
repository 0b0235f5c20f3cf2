"""PySpark-native analytics engine with the capabilities of
hililiwei/iceberg-tools (Iceberg metadata introspection + table
maintenance) extended with large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Reference parity target: /root/reference (hililiwei/iceberg-tools),
re-expressed Spark-first — see SURVEY.md.
"""

__version__ = "0.1.0"
