"""glistmaker CLI — flag-compatible with the reference
(src/glistmaker.c:158-228; defaults src/glistmaker.c:49-52,106-108).

Usage: glistmaker <INPUTFILES> [OPTIONS]
"""

from __future__ import annotations

import sys

from genometester4_tpu import __version__

VERSION_LINE = 'glistmaker version 4.2.16 (stable)\n'
HELP = 'glistmaker version 4.2.16 (stable)\nUsage: glistmaker <INPUTFILES> [OPTIONS]\nOptions:\n    -v, --version           - print version information and exit\n    -h, --help              - print this usage screen and exit\n    -w, --wordlength NUMBER - specify index wordsize (1-32)\n    -o, --outputname STRING - specify output name (default "out")\n    --index                 - create index instead of list\n    --num_threads           - number of threads (default 8)\n    --max_tables            - maximum number of temporary tables (default 4096)\n    --table_size            - maximum size of the temporary table (default 1048576)\n    --tmpdir                - directory for temporary files (may need an order of magnitude more space than the size of the final list)\n    --stream                - read files as streams instead of memory-mapping (slower but uses less virtual memory)\n    --index                 - creates indexed list (larger and slower)\n    -D                      - increase debug level\n'


def _main_impl(argv=None) -> int:
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
                sys.stdout.write(VERSION_LINE)
                return 0
            elif a in ("-h", "--help", "-?"):
                sys.stderr.write(HELP)
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


def main(argv=None) -> int:
    from genometester4_tpu.utils.backend import output_heavy_compute
    
    with output_heavy_compute():
        return _main_impl(argv)


if __name__ == "__main__":
    raise SystemExit(main())
