"""Extension operators (SURVEY.md §2.3, E1-E6): the LLM-training-data
pipeline surface — dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search, text analysis, multimodal columns,
approximate sketches. All designed Spark-first for 100 TB inputs."""
