"""Spark operators: the reference's parse surface re-expressed as
Arrow-vectorized DataFrame transforms, plus the training-data-pipeline
operators (dedup, similarity, text analysis) the 100 TB corpus needs."""
