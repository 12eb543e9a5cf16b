"""glistcompare CLI — flag-compatible with the reference
(src/glistcompare.c:84-330).
"""

from __future__ import annotations

import sys
import time

from genometester4_tpu import __version__

VERSION_LINE = 'glistcompare version 4.2.16 (stable)\n'
HELP = 'glistcompare version 4.2.16 (stable)\nUsage: glistcompare INPUTLIST1 [INPUTLIST2...] METHOD [OPTIONS]\nOptions:\n    -v, --version            - print version information and exit\n    -h, --help               - print this usage screen and exit\n    -u, --union              - union of input lists\n    -i, --intersection       - intersection of input lists\n    -d, --difference         - difference of input lists\n    -dd, --double_difference - double difference of input lists\n    -du, --diff_union        - subtract first list from the second and finds difference\n    -mm, --mismatch   NUMBER - specify number of mismatches (default 0, can be used with -diff and -ddiff)\n    -c, --cutoff NUMBER      - specify frequency cut-off (default 1)\n    -o, --outputname STRING  - specify output name (default "out")\n    -r, --rule STRING        - specify rule how final frequencies are calculated (default, add, subtract, min, max, first, second, 1, 2)\n                               NOTE: rules min, subtract, first and second can only be used with finding the intersection.\n    -ss, --subset METHOD SIZE - make subset with given method (rand, rand_unique, rand_weighted_unique)\n    --seed INTEGER           - Set seed of random number generator (default uses start time)\n    --count_only             - output count of k-mers instead of k-mers themself\n    --disable_scouts         - disable list read-ahead in background thread\n    --stream                 - read input as stream (do not memory map files)\n    -D                       - increase debug level\n'


def _main_impl(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        sys.stdout.write(HELP)  # src/glistcompare.c:103-105
        return 1
    files: list[str] = []
    cutoff, nmm = 1, 0
    find_union = find_intrsec = find_diff = find_ddiff = False
    subtraction = count_only = False
    rule = "default"
    count_override = 1
    outputname = "out"
    find_subset = False
    subset_method = "rand"
    subset_size = 0
    seed = -1
    debug = 0

    i = 0
    try:
        while i < len(argv):
            a = argv[i]
            if not a.startswith("-") or a == "-":
                files.append(a)
            elif a in ("-v", "--version"):
                sys.stdout.write(VERSION_LINE)
                return 0
            elif a in ("-h", "--help", "-?"):
                sys.stdout.write(HELP)
                return 0
            elif a in ("-o", "--outputname"):
                if i + 1 >= len(argv) or argv[i + 1].startswith("-"):
                    sys.stderr.write("Warning: No output name specified!\n")
                else:
                    i += 1
                    outputname = argv[i]
            elif a in ("-c", "--cutoff"):
                i += 1
                cutoff = int(argv[i])
            elif a in ("-mm", "--mismatch"):
                i += 1
                nmm = int(argv[i])
            elif a in ("-u", "--union"):
                find_union = True
            elif a in ("-i", "--intersection"):
                find_intrsec = True
            elif a in ("-d", "--difference"):
                find_diff = True
            elif a in ("-dd", "--double_difference"):
                find_ddiff = True
            elif a in ("-du", "--diff_union"):
                find_diff = True
                subtraction = True
            elif a == "--count_only":
                count_only = True
            elif a in ("-r", "--rule"):
                i += 1
                r = argv[i]
                if r[:1].isdigit() and r[0] != "0":
                    rule = "number"
                    count_override = int(r)
                elif r in ("default", "add", "sum", "subtract", "min", "max",
                           "first", "second"):
                    rule = "add" if r == "sum" else r
                # unknown strings silently keep previous rule (reference quirk)
            elif a in ("-ss", "--subset"):
                find_subset = True
                i += 1
                subset_method = argv[i]
                if subset_method not in ("rand", "rand_unique",
                                         "rand_weighted_unique"):
                    sys.stderr.write(HELP)
                    return 1
                i += 1
                subset_size = int(argv[i])
            elif a == "--seed":
                i += 1
                seed = int(argv[i])
            elif a == "--print_operation":
                pass  # echoed below after parse
            elif a in ("--disable_scouts", "--stream"):
                pass
            elif a == "-D":
                debug += 1
            else:
                sys.stderr.write(f"Unknown argument: {a}!\n")
                sys.stdout.write(HELP)
                return 1
            i += 1
    except (IndexError, ValueError):
        sys.stderr.write(HELP)
        return 1

    if find_ddiff:
        find_diff = True
    if not find_intrsec and rule in ("min", "first", "second"):
        sys.stderr.write("Error: Rules min, fist and second can only be used "
                         "with finding the intersection.\n")
        return 1
    if not find_intrsec and not find_diff and rule == "subtract":
        sys.stderr.write("Error: Rule subtract can only be used with "
                         "intersection and difference.\n")
        return 1

    if seed == -1:
        seed = int(time.time())

    from genometester4_tpu.pipelines import listcompare as lc

    if find_subset:
        if len(files) != 1:
            sys.stderr.write("Error: Subsetting multiple files is not supported\n")
            return 1
        try:
            lc.make_subset(files[0], subset_method, subset_size, outputname, seed)
        except ValueError as e:
            sys.stderr.write(f"Error: {e}\n")
            return 1
        return 0

    if len(files) < 2:
        sys.stderr.write("Error: At least 2 list/index files are needed\n")
        return 1

    if len(files) > 2:
        if not (find_union or find_intrsec) or find_diff or find_ddiff:
            sys.stderr.write("Error: Algorithm incompatible with multiple files!\n")
            return 1
        if nmm:
            sys.stderr.write("Error: Multiple files are not compatible with mismatches!\n")
            return 1
        for op in (["union"] if find_union else []) + (
                ["intrsec"] if find_intrsec else []):
            res = lc.compare_multi(files, op, outputname, cutoff, rule,
                                   count_override, count_only)
            if count_only or debug:
                n, t = res[op]
                print(f"NUnique\t{n}\nNTotal\t{t}")
        return 0

    if nmm:
        ops = []
        if find_diff:
            ops.append("diff1")
        if find_ddiff:
            ops.append("diff2")
        res = lc.compare_pair_mm(files[0], files[1], ops, outputname, cutoff,
                                 nmm, subtraction, count_only)
        for op in ops:
            if count_only:
                n, t = res[op]
                print(f"NUnique\t{n}\nNTotal\t{t}")
        return 0

    ops = []
    if find_union:
        ops.append("union")
    if find_intrsec:
        ops.append("intrsec")
    if find_diff:
        ops.append("diff1")
    if find_ddiff:
        ops.append("diff2")
    if not ops:
        sys.stderr.write("Error: No method specified!\n" + HELP)
        return 1
    res = lc.compare_pair(files[0], files[1], ops, outputname, cutoff, rule,
                          count_override, subtraction, count_only)
    if count_only:
        for op in ops:
            n, t = res[op]
            print(f"NUnique\t{n}\nNTotal\t{t}")
    return 0


def main(argv=None) -> int:
    from genometester4_tpu.utils.backend import output_heavy_compute
    
    with output_heavy_compute():
        return _main_impl(argv)


if __name__ == "__main__":
    raise SystemExit(main())
