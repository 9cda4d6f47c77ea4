"""Ray-Data-native fulltext/ETL engine with the capabilities of
SIEM on Amazon OpenSearch Service (reference at /root/reference).

Replaces the reference's Lambda->OpenSearch split
(reference: source/lambda/es_loader/index.py:252-397 for the ETL half,
source/lambda/deploy_es/command_index.txt for the delegated Lucene half)
with a from-scratch Ray Data engine:

- document preparation / ETL operators as ``map_batches`` stages
  (``stages/``), mirroring the reference LogParser order
  (reference: siem/__init__.py:519-574);
- a Lucene-style inverted index built by a groupby-term shuffle with
  delta-varint block postings + block-max metadata (``pipelines/build_index``,
  ``postings``);
- BM25 (k1=1.2, b=0.75, Lucene-default formula) top-k query execution by
  stateful shard actors with block-max WAND (``state/searcher``), replacing
  the OpenSearch query half the reference delegates wholesale.

Everything here derives from public knowledge only: the Ray / Ray Data and
Apache Arrow APIs, the public reference repo, and published IR literature
(BM25; block-max WAND, Ding & Suel SIGIR'11; Lucene's documented SmallFloat
norm quantization).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75

# Lucene term byte-length limit (reference: siem/__init__.py:1131-1147
# truncates strings at 32,766 utf-8 bytes before indexing).
MAX_TERM_BYTES = 32766
