"""ferenda_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference system (mogaio/ferenda, at /root/reference, cited by file:line
throughout).

The reference is a single-node Python ETL framework that turns
unstructured document collections into Linked Data (RDF triples).  This
package re-expresses each of its pipeline stages as columnar Spark
DataFrame transforms over a Common-Crawl-style ``web_pages`` table:

    web_pages(url, warc_ts, html binary, text, lang)
      -> extract   (vectorized decode + parse + plaintext)   [operators.extract]
      -> triples   (metadata lift, sections, citations)      [operators.triples]
      -> canonical (entity linking, dependency joins)        [operators.canonicalize]
      -> tables    (partitioned triple/entries/deps tables)  [pipeline]

It is NOT a port: per-document sequential logic (FSM structure
recovery, recursive tree walks) runs inside Arrow-batched pandas UDFs;
everything row-scalar is plain Column expressions; all joins /
aggregations are Catalyst-planned DataFrame ops.
"""

__version__ = "0.1.0"

from ferenda_spark.session import get_spark  # noqa: F401
