"""Scale-path operators beyond the reference's own surface (SURVEY.md §2.9
[D] rows): as-of joins, sessionization, exact/near dedup, vector similarity
search, text analysis, multimodal column plumbing.

All operators are pure DataFrame compositions (shuffle-aware, no driver
loops); Python only enters via Arrow-batched pandas UDFs where Spark has no
built-in (multimodal decode).
"""
