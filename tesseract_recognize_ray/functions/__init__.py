"""Generic data-processing operators: relational primitives, deduplication,
similarity search, text analysis, multimodal plumbing. These extend the
reference's operator set (SURVEY.md §2) with the operations a large-scale
training-data pipeline needs, expressed Ray-Data-first."""
