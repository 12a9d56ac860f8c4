"""tiny_md_hbase_spark — a PySpark-native analytics engine with the query
capabilities of shojinishimura/Tiny-MD-HBase (MD-HBase, MDM 2011), built
Spark-first.

The reference is an online KV spatial store on HBase (Z-order-clustered
point data, rectangle range queries, point gets, kNN, adaptive quad-trie
bucket index). This package re-expresses those semantics as declarative
DataFrame plans that Catalyst/Tungsten optimize — plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB deployment needs.

Layout:
    zorder.py             Morton codec as native Column expressions
    sources/              fixture loaders, derived points view, z-sorted writer
    operators/spatial.py  range/point/kNN query builders
    operators/index.py    adaptive bucket index (split-to-fixpoint)
    operators/dedup.py    exact/minhash/simhash/ngram/embedding dedup
    operators/similarity.py  embedding ANN (brute cosine + LSH-bucketed)
    operators/text.py     lang-id, quality, token counts, fingerprints
    operators/multimodal.py  binary-column decode/feature plumbing (stubbed codecs)
    streaming/            Structured Streaming ingest with index refresh
"""

__version__ = "0.1.0"
