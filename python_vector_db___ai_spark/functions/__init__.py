from python_vector_db___ai_spark.functions.vector import (  # noqa: F401
    vec_dot,
    vec_norm,
    l2_normalize,
    cosine_similarity,
    cosine_distance,
    l2_distance,
    inner_product,
    neg_inner_product,
    euclidean_similarity,
)
from python_vector_db___ai_spark.functions.hashing import (  # noqa: F401
    stable_hash64,
    md5_hex,
)
