"""Large-scale training-data operators.

Beyond rook's CDC surface, these are the operations a 100 TB
training-data pipeline needs, each built Ray-Data-first (vectorized
map_batches, broadcast small sides, partial-aggregate before shuffles):

* ``text``   — language-ID, quality scoring, token counting,
  fingerprints, PII redaction, repetition signals, vocabulary top-k
* ``dedup``  — exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
  near-dup, duplicated-span stats, incremental anti-join
* ``chunk``  — content-defined chunking (rolling-hash Rabin split) +
  shift-robust duplicated-chunk stats
* ``ann``    — brute-force / LSH / IVF cosine top-k similarity search,
  distributed k-means coarse-quantizer training
* ``join``   — broadcast, hash-bucketed, backward as-of, range
  (interval) joins
* ``pack``   — globally deterministic sequence packing / splitting
* ``corpus`` — composed clean→dedup→tokenize→pack pipeline, stratified
  sampling, mixture resampling, deterministic training-order shuffle,
  decontamination
* ``window`` — rolling (ROWS BETWEEN) per-key aggregates
* ``stats``  — exact quantiles via distributed histogram (no global
  sort)
* ``multimodal`` — real stdlib WAV + PNG + APNG codecs (decode,
  resize, frame sampling); strict integration point for external
  formats (JPEG/H.264)
"""
