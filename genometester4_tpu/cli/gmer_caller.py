"""gmer_caller CLI — flag-compatible with the reference
(src/gmer_caller.c:471-540).

Usage: gmer_caller ARGUMENTS COUNTS_FILE
"""

from __future__ import annotations

import sys

REF_VERSION = "4.2.16 (stable)"
MAX_THREADS = 32

HELP = f"""gmer_caller version {REF_VERSION}
Usage:
  gmer_caller ARGUMENTS COUNTS_FILE
Arguments:
    -v | --version      - Print version information and exit
    --training_size NUM - Use NUM markers for training (default 100000)
    --runs NUMBER       - Perfom NUMBER runs of model training (use 0 for no training)
    --num_threads NUM   - Use NUM threads (min 1, max {MAX_THREADS}, default {MAX_THREADS // 2})
    --header            - Print table header
    --non_canonical     - Output non-canonical genotypes
    --prob_cutoff       - probability cutoff for calling genotype (default 0)
    --alternatives      - Print probabilities of all alternative genotypes
    --info              - Print information about individual
    --no_genotypes      - Print only summary information, not actual genotypes
    --model TYPE        - Model type (full, diploid, haploid)
    --params PARAMS     - Model parameters (error, p0, p1, p2, coverage, size, size2)
    --coverage NUM      - Average coverage of reads
    -D                  - increase debug level
"""


def main(argv=None) -> int:
    from genometester4_tpu.pipelines.gmercall import (
        MODEL_DIPLOID, MODEL_FULL, MODEL_HAPLOID, DEFAULT_PARAMS, run_caller)

    argv = list(sys.argv[1:] if argv is None else argv)
    call_fn = None
    nruns = 5
    max_training = 100000
    nthreads = MAX_THREADS // 2
    header = non_canonical = alternatives = info = 0
    print_gt = 1
    prob_cutoff = 0.0
    model = MODEL_FULL
    params = DEFAULT_PARAMS.copy()
    params_specified = False
    i = 0
    try:
        while i < len(argv):
            a = argv[i]
            if a in ("-v", "--version"):
                print(f"gmer_caller version {REF_VERSION}")
                return 0
            elif a in ("-h", "--help"):
                print(HELP)
                return 0
            elif a == "-D":
                pass
            elif a == "--runs":
                i += 1
                nruns = int(argv[i])
            elif a == "--training_size":
                i += 1
                max_training = int(argv[i])
            elif a == "--num_threads":
                i += 1
                nthreads = int(argv[i])
            elif a == "--header":
                header = 1
            elif a == "--non_canonical":
                non_canonical = 1
            elif a == "--prob_cutoff":
                i += 1
                prob_cutoff = float(argv[i])
            elif a == "--model":
                i += 1
                model = {"full": MODEL_FULL, "diploid": MODEL_DIPLOID,
                         "haploid": MODEL_HAPLOID}.get(argv[i])
                if model is None:
                    sys.stderr.write(HELP)
                    return 1
            elif a == "--params":
                for j in range(7):
                    params[j] = float(argv[i + 1 + j])
                params_specified = True
                i += 7
            elif a == "--coverage":
                i += 1
                params[4] = float(argv[i])
            elif a == "--alternatives":
                alternatives = 1
            elif a == "--info":
                info = 1
            elif a == "--no_genotypes":
                print_gt = 0
            else:
                if call_fn is not None:
                    sys.stderr.write(HELP)
                    return 1
                call_fn = a
            i += 1
    except (IndexError, ValueError):
        sys.stderr.write(HELP)
        return 1

    if call_fn is None:
        sys.stderr.write("No input file specified\n" + HELP)
        return 1
    if nthreads < 1 or nthreads > MAX_THREADS:
        sys.stderr.write(f"Invalid number of threads {nthreads} - should be "
                         f"1-{MAX_THREADS}\n" + HELP)
        return 1

    try:
        with open(call_fn, "rb") as f:
            data = f.read()
    except OSError:
        sys.stderr.write(f"Cannot read {call_fn}\n")
        return 1

    return run_caller(data, sys.stdout, model=model, nruns=nruns,
                      max_training=max_training, nthreads=nthreads,
                      header=bool(header), non_canonical=bool(non_canonical),
                      prob_cutoff=prob_cutoff,
                      alternatives=bool(alternatives), info=bool(info),
                      print_gt=bool(print_gt), params0=params,
                      params_specified=params_specified,
                      version_str=REF_VERSION)


if __name__ == "__main__":
    raise SystemExit(main())
