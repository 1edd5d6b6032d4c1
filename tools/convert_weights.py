"""One-time conversion of reference .pth checkpoints to .npz (HWIO).

Usage:
    python -m tools.convert_weights [reference_models_dir] [out_dir]

Defaults to /root/reference/models -> <repo>/weights. Requires torch (only
for this tool; the runtime never imports torch).
"""

import sys

from optimaltextures_tpu.models import weights


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/models"
    dst = sys.argv[2] if len(sys.argv) > 2 else None
    written = weights.convert_all(src, dst)
    for path in written:
        print("wrote", path)
    if not written:
        print("no checkpoints found in", src, file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
