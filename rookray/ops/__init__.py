"""Large-scale training-data operators.

Beyond rook's CDC surface, these are the operations a 100 TB
training-data pipeline needs, each built Ray-Data-first (vectorized
map_batches, broadcast small sides, partial-aggregate before shuffles):

* ``text``  — language-ID, quality scoring, token counting, fingerprints
* ``dedup`` — exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
* ``ann``   — brute-force + LSH-bucketed cosine top-k similarity search
* ``multimodal`` — binary-payload decode/feature plumbing (stubbed
  decoders: the image/audio libs aren't in this container)
"""
