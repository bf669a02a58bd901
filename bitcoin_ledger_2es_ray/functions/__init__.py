"""Pure, vectorized kernels (no Ray): tokenizer, codecs, BM25 math, WAND."""
