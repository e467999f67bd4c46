"""Scalar function family: URL canonicalisation (reference
url_normalisation.py / hyperlink.py), hashing, image codecs, text
analysis. All hot-path functions are built-in Spark expressions or
Arrow-batched pandas UDFs — never row-at-a-time Python UDFs.
"""
