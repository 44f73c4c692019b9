"""Command line interface: ``s2p_tpu config.json [--start_from N]``
(parity: /root/reference/s2p/cli.py)."""

from __future__ import annotations

import argparse
import shutil

from . import pipeline


def main():
    parser = argparse.ArgumentParser(
        description='S2P-TPU: TPU-native satellite stereo pipeline')
    parser.add_argument('config', metavar='config.json',
                        help='path to a json file containing the paths to '
                             'input and output files and the algorithm '
                             'parameters')
    parser.add_argument('--start_from', dest='start_from', type=int,
                        default=0,
                        help='restart the process from a given step in case '
                             'of an interruption or an update')
    args = parser.parse_args()

    user_cfg = pipeline.read_config_file(args.config)
    try:
        pipeline.main(user_cfg, start_from=args.start_from)
    except pipeline.runner.TimeoutError_ as e:
        # a timed-out stage may leave daemon worker threads stuck inside
        # device calls; a normal interpreter exit then aborts FATAL in the
        # runtime teardown.  Report cleanly and hard-exit, the in-process
        # analogue of the reference's child-process kill (common.py:70-94).
        import os
        import sys
        print(f'\ns2p_tpu: aborted: {e}', file=sys.stderr)
        sys.stderr.flush()
        sys.stdout.flush()
        os._exit(1)

    # backup input config inside the output directory
    try:
        shutil.copy2(args.config,
                     f"{user_cfg['out_dir']}/config.json.orig")
    except (OSError, shutil.SameFileError):
        pass


if __name__ == '__main__':
    main()
