"""Column-level helper functions (all JVM-side built-in compositions —
no Python UDFs): vector math over ARRAY<FLOAT> embeddings, text
analysis/hashing for the LLM pipeline (SURVEY.md §2-E)."""

from .text import char_ngrams, doc_tokens, quality_score  # noqa: F401
from .vectors import cosine, dot, l2_norm  # noqa: F401
