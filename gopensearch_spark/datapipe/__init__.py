from gopensearch_spark.datapipe.dedup import (  # noqa: F401
    assign_dup_clusters,
    canonical_url,
    connected_components,
    domain_blocklist_filter,
    domain_stats,
    decontaminate,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    registered_domain,
    segment_dedup,
    simhash_pairs,
    url_dedup,
)
from gopensearch_spark.datapipe.scrub import (  # noqa: F401
    c4_rules,
    gopher_rules,
    normalize_text,
    scrub_pii,
    scrub_pii_col,
)
from gopensearch_spark.datapipe.multimodal import (  # noqa: F401
    extract_features,
    resize_images,
    sample_frames,
)
from gopensearch_spark.datapipe.packing import chunk_documents, pack_sequences  # noqa: F401
from gopensearch_spark.datapipe.sampling import (  # noqa: F401
    hash_bucket,
    hash_sample,
    hash_split,
    stratified_sample,
)
from gopensearch_spark.datapipe.similarity import ann_lsh_topk, cosine_topk, ivf_topk, rrf_fuse  # noqa: F401
from gopensearch_spark.datapipe.textqc import (  # noqa: F401
    doc_logprob,
    fingerprint,
    lang_id,
    quality_score,
    repetition_stats,
    token_stats,
    unigram_lm,
)
