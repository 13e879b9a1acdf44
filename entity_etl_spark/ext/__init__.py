"""Extension operators (SURVEY.md §2.3, E1-E6): the LLM-training-data
pipeline surface — dedup (exact / MinHash-LSH / blocked SimHash / n-gram
Jaccard / embedding cosine), similarity search (brute, partition-heap,
margin multi-probe LSH, IVF, product quantization), text analysis (quality,
repetition, language ID, BPE-ish token counts), PII redaction, sequence
packing, mixture resampling, multimodal columns with REAL WAV/BMP codecs,
Bloom prefilters, Z-order layout, sampling/splits, chunking, connected
components. All designed Spark-first for 100 TB inputs."""
