"""Small export utilities.

  unityfy      <- scripts/utils/Unityfier.py: transcripts -> Unity-
                  readable "start,end,word" text files.
  human-study  <- scripts/creat_human-study.py: cut word-aligned clip
                  windows out of generated/ground-truth motion for
                  side-by-side human evaluation.
"""
from __future__ import annotations

import argparse
import glob
import os


def unityfy(jsons_path: str, out_dir: str | None = None) -> list:
    from gesture2vec_tpu.io.subtitles import read_subtitles

    out_dir = out_dir or os.path.join(jsons_path, "Unity")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for jfile in sorted(glob.glob(os.path.join(jsons_path, "*.json")) +
                        glob.glob(os.path.join(jsons_path, "*.tsv"))):
        name = os.path.splitext(os.path.basename(jfile))[0]
        words = read_subtitles(jfile)
        lines = [f"{s},{e},{w}" for w, s, e in words]
        out = os.path.join(out_dir, name + ".txt")
        with open(out, "w") as f:
            f.write("\n".join(lines))
        written.append(out)
    return written


def human_study_clips(bvh_path: str, transcript_path: str, out_dir: str,
                      clip_seconds: float = 6.0) -> list:
    """Cut a BVH file into word-aligned windows for human study
    (ref: scripts/creat_human-study.py)."""
    from gesture2vec_tpu.io.bvh import parse_bvh, write_bvh
    from gesture2vec_tpu.io.subtitles import read_subtitles

    os.makedirs(out_dir, exist_ok=True)
    data = parse_bvh(bvh_path)
    words = read_subtitles(transcript_path)
    fps = data.framerate
    clip_frames = int(round(clip_seconds * fps))
    written = []
    k = 0
    t = 0.0
    duration = data.n_frames / fps
    while t + clip_seconds <= duration:
        f0 = int(t * fps)
        piece = data.clone()
        piece.values = data.values[f0:f0 + clip_frames]
        name = f"clip_{k:03d}"
        out = os.path.join(out_dir, name + ".bvh")
        write_bvh(piece, out)
        inside = [w for w in words if t <= (w[1] + w[2]) / 2 < t +
                  clip_seconds]
        with open(os.path.join(out_dir, name + ".txt"), "w") as f:
            f.write(" ".join(w[0] for w in inside))
        written.append(out)
        k += 1
        t += clip_seconds
    return written


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    u = sub.add_parser("unityfy")
    u.add_argument("jsons_path")
    u.add_argument("--out", default=None)
    h = sub.add_parser("human-study")
    h.add_argument("bvh")
    h.add_argument("transcript")
    h.add_argument("--out", default="human_study")
    h.add_argument("--seconds", type=float, default=6.0)
    args = parser.parse_args()
    if args.cmd == "unityfy":
        for p in unityfy(args.jsons_path, args.out):
            print(p)
    else:
        for p in human_study_clips(args.bvh, args.transcript, args.out,
                                   args.seconds):
            print(p)


if __name__ == "__main__":
    main()
