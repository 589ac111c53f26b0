"""Port a reference PyTorch checkpoint to an orbax checkpoint directory.

Usage: python tools/port_ckpt.py /path/to/model.ckpt ./ported_ckpt

Afterwards both CLIs accept either form via --ckpt; the torch file also
works directly (ported on the fly), this just caches the conversion.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    src, dst = sys.argv[1], sys.argv[2]

    import numpy as np
    from control_gic_tpu.utils.checkpoint import save_checkpoint
    from control_gic_tpu.utils.port_torch import port_cgic_checkpoint

    params, counts = port_cgic_checkpoint(src)
    n_params = sum(int(np.prod(np.shape(v)))
                   for v in _leaves(params))
    print(f"ported {n_params:,} parameters; "
          f"counter total {int(counts.sum()):,}")
    state = {"gen_params": params, "ema_params": params,
             "codebook_counts": counts, "step": np.int32(0)}
    save_checkpoint(dst, 0, state, wait=True)
    print(f"wrote orbax checkpoint to {dst}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
