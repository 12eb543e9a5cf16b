from genometester4_tpu.ops.encode import (  # noqa: F401
    NUCL_CODES,
    string_to_word,
    word_to_string,
    reverse_complement_u64,
    canonical_u64,
    split_u64,
    join_u64,
)
