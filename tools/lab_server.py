"""File-driven wrapper around tools/tpu_lab.py for environments without a
TTY/tmux: keeps ONE compiled engine process (and the single-chip claim)
alive while measurement snippets are fed in as files.

Protocol: poll /tmp/lab_inbox/NNN.py (sorted); exec each in the lab
namespace; write stdout+traceback to /tmp/lab_outbox/NNN.txt (atomic via
rename). A file named STOP ends the loop.
"""

import io
import os
import sys
import time
import traceback

INBOX = "/tmp/lab_inbox"
OUTBOX = "/tmp/lab_outbox"
os.makedirs(INBOX, exist_ok=True)
os.makedirs(OUTBOX, exist_ok=True)

# build the lab namespace (compiles on first measurements, not at import)
sys.argv = [sys.argv[0]]
sys.path.insert(0, "/root/repo")
import tools.tpu_lab as lab  # noqa: E402

ns = vars(lab)
print("lab ready; polling", INBOX, flush=True)
done = set(os.listdir(OUTBOX))

while True:
    if os.path.exists(os.path.join(INBOX, "STOP")):
        print("STOP received", flush=True)
        break
    for name in sorted(os.listdir(INBOX)):
        if not name.endswith(".py"):
            continue
        out_name = name[:-3] + ".txt"
        if out_name in done:
            continue
        path = os.path.join(INBOX, name)
        buf = io.StringIO()
        real = sys.stdout
        try:
            code = open(path).read()
            sys.stdout = buf
            t0 = time.perf_counter()
            exec(compile(code, name, "exec"), ns)
            buf.write(f"\n[ok {time.perf_counter() - t0:.1f}s]\n")
        except Exception:
            buf.write("\n" + traceback.format_exc())
        finally:
            sys.stdout = real
        tmp = os.path.join(OUTBOX, "." + out_name)
        with open(tmp, "w") as f:
            f.write(buf.getvalue())
        os.rename(tmp, os.path.join(OUTBOX, out_name))
        done.add(out_name)
        print("done", name, flush=True)
    time.sleep(2)
