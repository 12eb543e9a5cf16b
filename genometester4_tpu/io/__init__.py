from genometester4_tpu.io.fasta import ParsedSequences, parse_sequences, open_source  # noqa: F401
