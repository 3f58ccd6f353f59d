"""Multi-node driver: per-host series slice + the standard CLI chain.

Reference equivalent: scripts/process_parallel.py (ipyparallel map over
files). Here each SLURM task takes a disjoint slice of the raw series
(parallel.multihost) and runs the normal pipelines on it; outputs carry
per-node unique series numbers, so results concatenate trivially.

Usage (under srun / or standalone with --node_num/--nb_nodes):
    python scripts/process_distributed.py --raw_path ... \
        --processing_setup process.yaml --enable-trig --enable-feature
"""

import sys

from detprocess_tpu import cli
from detprocess_tpu.io.rawdata import RawData
from detprocess_tpu.parallel import multihost


def main(argv=None):
    parser = cli.build_parser()
    parser.add_argument("--node_num", type=int, default=None)
    parser.add_argument("--nb_nodes", type=int, default=None)
    args, remaining = parser.parse_known_args(argv)

    rawdata = RawData(args.raw_path,
                      data_type="calib" if args.calib else "continuous",
                      restricted=args.restricted)
    all_series = rawdata.get_series_list()
    my_series = multihost.split_series_for_host(
        all_series, node_num=args.node_num, nb_nodes=args.nb_nodes)
    if not my_series:
        print("INFO: no series assigned to this node")
        return 0
    print(f"INFO: node processes {len(my_series)}/{len(all_series)} series")

    forwarded = [a for a in (argv or sys.argv[1:])
                 if not a.startswith(("--node_num", "--nb_nodes"))]
    forwarded += ["--series", *my_series]
    return cli.main(forwarded)


if __name__ == "__main__":
    sys.exit(main())
