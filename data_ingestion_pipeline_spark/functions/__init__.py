"""Column-function library: normalization, text analysis, vector math."""
