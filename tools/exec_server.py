"""File-driven exec server: keep one TPU process (and its compiled
programs) alive across many experiments.

Fresh processes pay minutes of XLA compiles on this box (the axon backend
has no persistent compilation cache, CLAUDE.md), which made round-3's
on-TPU iteration impractical. This server executes snippet files in ONE
long-lived namespace, so models/codecs/jitted programs built by earlier
snippets stay warm for later ones.

Usage:
    python tools/exec_server.py /tmp/exec &
    # submit work (atomic: write elsewhere, then rename into the dir):
    cp snippet.py /tmp/exec/01_setup.py.tmp && \
        mv /tmp/exec/01_setup.py.tmp /tmp/exec/01_setup.py
    # result appears as /tmp/exec/01_setup.py.out (stdout + traceback,
    # terminated by "== OK" / "== ERR"); the snippet is renamed *.done
    # stop:
    touch /tmp/exec/STOP

Snippets run with `exec` in a shared dict namespace; `__name__` is
"exec_server_ns". State (variables, imports, jitted fns) persists between
snippets. Jobs run in lexicographic filename order.
"""
import contextlib
import io
import os
import sys
import time
import traceback


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/exec"
    os.makedirs(d, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    ns = {"__name__": "exec_server_ns"}
    print(f"exec server watching {d} (pid {os.getpid()})", flush=True)
    while True:
        if os.path.exists(os.path.join(d, "STOP")):
            print("exec server stopping", flush=True)
            return
        jobs = sorted(f for f in os.listdir(d)
                      if f.endswith(".py") and not f.endswith(".tmp"))
        for j in jobs:
            p = os.path.join(d, j)
            try:
                src = open(p).read()
            except OSError:
                continue
            buf = io.StringIO()
            t0 = time.perf_counter()
            try:
                with contextlib.redirect_stdout(buf), \
                        contextlib.redirect_stderr(buf):
                    exec(compile(src, p, "exec"), ns)
                status = "OK"
            except BaseException:
                buf.write(traceback.format_exc())
                status = "ERR"
            dt = time.perf_counter() - t0
            with open(p + ".out", "w") as f:
                f.write(buf.getvalue() + f"\n== {status} ({dt:.1f}s)\n")
            os.rename(p, p + ".done")
            print(f"{j}: {status} ({dt:.1f}s)", flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
