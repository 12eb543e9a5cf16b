"""glistmaker CLI — flag-compatible with the reference
(src/glistmaker.c:158-228; defaults src/glistmaker.c:49-52,106-108).

Usage: glistmaker <INPUTFILES> [OPTIONS]
"""

from __future__ import annotations

import sys

from genometester4_tpu import __version__

HELP = """Usage: glistmaker <INPUTFILES> [OPTIONS]
Options:
    -v, --version           - print version information and exit
    -h, --help              - print this usage screen and exit
    -w, --wordlength NUMBER - specify index wordsize (1-32) (required)
    -c, --cutoff NUMBER     - specify frequency cut-off (default 1)
    --max NUMBER            - specify maximum frequency (default 4294967295)
    -o, --outputname STRING - specify output name (default "out")
    --num_threads           - number of worker threads (accepted, ignored: TPU backend)
    --max_tables            - maximum number of temporary tables (accepted, ignored)
    --table_size            - maximum size of the temporary table (accepted, ignored)
    --tmpdir                - temporary directory (accepted, ignored)
    --stream                - read files as streams (accepted, ignored)
    -D                      - increase debug level
"""


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    inputs: list[str] = []
    wordlength = 0
    cutoff = 1
    maxfreq = 0xFFFFFFFF
    outputname = "out"
    create_index = False
    debug = 0
    i = 0
    try:
        while i < len(argv):
            a = argv[i]
            if a in ("-v", "--version"):
                print(f"glistmaker version {__version__} (genometester4_tpu)")
                return 0
            elif a in ("-h", "--help", "-?"):
                print(HELP)
                return 0
            elif a in ("-o", "--outputname"):
                i += 1
                outputname = argv[i]
            elif a in ("-w", "--wordlength"):
                i += 1
                wordlength = int(argv[i])
            elif a in ("-c", "--cutoff", "--min"):
                i += 1
                cutoff = int(argv[i])
            elif a == "--max":
                i += 1
                maxfreq = int(argv[i])
            elif a in ("--num_threads", "--max_tables", "--table_size", "--tmpdir"):
                i += 1  # accepted for compatibility; scheduling is XLA's job
            elif a == "--index":
                create_index = True
            elif a == "--stream":
                pass
            elif a == "-D":
                debug += 1
            elif a.startswith("-") and len(a) > 1:
                sys.stderr.write(HELP)
                return 1
            else:
                inputs.append(a)
            i += 1
    except (IndexError, ValueError):
        sys.stderr.write(HELP)
        return 1

    if not inputs:
        sys.stderr.write("Error: No FastA/FastQ file specified!\n" + HELP)
        return 1
    if not 1 <= wordlength <= 32:
        sys.stderr.write(f"Error: Invalid word-length {wordlength} (must be 1 - 32)!\n")
        return 1
    if cutoff < 1:
        sys.stderr.write(f"Error: Invalid frequency cut-off: {cutoff}! Must be positive.\n")
        return 1
    if maxfreq < cutoff:
        sys.stderr.write(f"Error: Invalid frequency range: {cutoff}-{maxfreq}!\n")
        return 1

    import os

    from genometester4_tpu.pipelines.listmaker import make_list

    for p in inputs:
        if p != "-" and not os.path.exists(p):
            sys.stderr.write(f"main: No such file (cannot stat): {p}\n")
            return 1

    if create_index:
        from genometester4_tpu.pipelines.listmaker import make_index
        out_path = f"{outputname}_{wordlength}.index"
        make_index(inputs, wordlength, out_path, min_count=cutoff,
                   max_count=maxfreq)
        return 0

    # bug-compat: the reference parses and validates -c/--max but never
    # applies them to .list output — gt4_write_union is called with a
    # hardcoded cutoff of 1 (src/glistmaker.c:333,814); min/max only
    # reach the --index writer (src/glistmaker.c:486)
    out_path = f"{outputname}_{wordlength}.list"
    hdr = make_list(inputs, wordlength, out_path, debug=debug)
    if debug:
        sys.stderr.write(f"Wrote {hdr.n_words} words (total count "
                         f"{hdr.total_count}) to {out_path}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
