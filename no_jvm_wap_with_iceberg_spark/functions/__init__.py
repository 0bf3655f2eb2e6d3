from no_jvm_wap_with_iceberg_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from no_jvm_wap_with_iceberg_spark.functions.textfn import (
    word_shingles,
    words,
)

__all__ = ["cosine_similarity", "dot_product", "l2_norm", "word_shingles", "words"]
