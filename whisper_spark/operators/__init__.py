"""Beyond-the-reference operators for large-scale training-data pipelines.

These are first-class engine components (BASELINE.json north star), all
expressed as declarative DataFrame transformations designed for 100 TB:

* :mod:`dedup` — exact, MinHash+LSH, SimHash (banded candidates + exact
  Hamming verify), n-gram Jaccard, embedding near-dup, connected-component
  clustering
* :mod:`similarity` — brute-force cosine top-k, IVF-bucketed ANN (incl. a
  persisted partition-pruned index), int8 quantization, product
  quantization with ADC search and integer-exact Lloyd training, IVF-PQ
  residual composite
* :mod:`textanalysis` — language-ID, quality scoring (incl. the
  published Gopher ruleset and the C4 transforming line filter, plus a
  one-projection classifier feature matrix), token counting,
  fingerprinting, fixed-stride chunking, benchmark decontamination,
  repetition scoring (incl. the full Gopher repetition metrics), BM25
  retrieval top-k
* :mod:`multimodal` — opaque binary columns with typed metadata and
  Arrow-batched decode/feature plumbing
* :mod:`sessions` — batch sessionization (streaming variant in
  whisper_spark.streaming)
"""

from . import dedup, multimodal, similarity, textanalysis  # noqa: F401
