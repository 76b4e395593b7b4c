"""CLI: build train/val clip stores from a Trinity-layout directory.

Mirrors `python trinity_data_to_lmdb.py <db_path>`
(ref: scripts/trinity_data_to_lmdb.py:156-161).
"""
from __future__ import annotations

import argparse
import logging


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("base_path",
                        help="directory with Motion/ Transcripts/ Audio/")
    parser.add_argument("--out", default=None,
                        help="output store dir (default <base>/store)")
    parser.add_argument("--fps", type=int, default=20)
    parser.add_argument("--no-audio", action="store_true")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    from gesture2vec_tpu.data.ingest import ingest_trinity

    train_dir, val_dir = ingest_trinity(args.base_path, args.out,
                                        tgt_fps=args.fps,
                                        with_audio=not args.no_audio)
    print(f"train store: {train_dir}")
    print(f"val store:   {val_dir}")


if __name__ == "__main__":
    main()
