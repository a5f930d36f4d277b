"""Large-scale training-data pipeline operators (beyond-reference surface):
deduplication, similarity search, text analysis, multimodal columns.

Reference analog: top-k Jaccard similarity search
(reference src/tpchBench/headers/TopJaccard.h:15-37) generalized to the
document/embedding dedup + ANN toolbox a 100 TB pretraining pipeline needs.
"""
