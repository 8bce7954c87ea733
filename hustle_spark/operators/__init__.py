from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    containment_pairs,
    dedup_pipeline,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_near_pairs,
    winnowing_fingerprints,
)
from .multimodal import attach_payload, decode_features, frame_sample_plan  # noqa: F401
from .rangejoin import range_join  # noqa: F401
from .sessionize import session_stats, sessionize  # noqa: F401
from .similarity import (  # noqa: F401
    ann_topk,
    ivf_index,
    ivf_topk,
    cosine,
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_signatures,
)
