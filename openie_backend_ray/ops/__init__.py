"""Large-scale training-data operators (dedup, similarity search, text
analysis, curation/packing/mixture, multimodal plumbing) over the flat ``documents`` /
``embeddings`` tables — first-class components of the engine alongside
the KG-construction pipeline (SURVEY.md §2)."""
