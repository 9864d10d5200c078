from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from .dedup_incremental import MinHashIndex  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_cosine_topk,
    embedding_near_dup_pairs,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from .quality import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
