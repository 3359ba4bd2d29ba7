"""Beyond-the-reference operators for large-scale training-data pipelines.

These are first-class engine components (BASELINE.json north star), all
expressed as declarative DataFrame transformations designed for 100 TB:

* :mod:`dedup` — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
  near-dup
* :mod:`similarity` — brute-force cosine top-k and IVF-bucketed ANN
* :mod:`textanalysis` — language-ID, quality scoring, token counting,
  fingerprinting
* :mod:`multimodal` — opaque binary columns with typed metadata and
  Arrow-batched decode/feature plumbing
"""

from . import dedup, multimodal, similarity, textanalysis  # noqa: F401
