"""Training-data-pipeline operators beyond the reference's scorers:
deduplication, similarity search, text analysis, multimodal plumbing."""
