"""LLM-data-pipeline operators (SURVEY.md §2-E): dedup, similarity search,
text analysis, embedding/multimodal ops. Populated in build-plan step 4."""
