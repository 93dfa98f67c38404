"""MVSNet pair.txt codec.

Format (reference: eval.py:90-100, README.md:64-72):

    NUM_VIEWPOINTS
    <ref id>
    <n> <src id> <score> <src id> <score> ...
    ... repeated per viewpoint
"""
from __future__ import annotations


def read_pair_file(path: str) -> list[tuple[int, list[int]]]:
    """Return [(ref_view, [src views...])], dropping entries with no sources."""
    data = []
    with open(path) as f:
        num_viewpoint = int(f.readline())
        for _ in range(num_viewpoint):
            ref_view = int(f.readline().rstrip())
            src_views = [int(x) for x in f.readline().rstrip().split()[1::2]]
            if src_views:
                data.append((ref_view, src_views))
    return data


def write_pair_file(path: str, pairs: list[tuple[int, list[tuple[int, float]]]]) -> None:
    """Write pairs given as [(ref, [(src, score), ...])]."""
    with open(path, "w") as f:
        f.write(f"{len(pairs)}\n")
        for ref, scored in pairs:
            f.write(f"{ref}\n{len(scored)} ")
            f.write(" ".join(f"{src} {score}" for src, score in scored) + "\n")
