"""Fault-injection worker for the checkpoint crash-atomicity test.

Not collected by pytest (no ``test_`` prefix).  Wraps the orbax
checkpointer so that the save at ``GEOT_CRASH_EPOCH`` first completes the
``.tmp`` write, then corrupts it (removes one payload file — the on-disk
state of a writer killed mid-flush) and SIGKILLs the process BEFORE the
swap into ``_ckpt_latest``.  The parent test asserts the previous intact
checkpoint survives and ``mode=resume`` restores from it.
"""
import os
import signal
import sys


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    dist = os.environ.get("GEOT_CRASH_DIST")      # "port,pid,nproc"
    if dist:
        # must precede ANY jax backend use (importing geot_tpu touches it)
        import jax

        port, pid, nproc = dist.split(",")
        jax.distributed.initialize(f"localhost:{port}",
                                   num_processes=int(nproc),
                                   process_id=int(pid))

    import geot_tpu.engine.checkpoint as ck

    crash_epoch = int(os.environ["GEOT_CRASH_EPOCH"])
    real_checkpointer = ck._checkpointer

    class CrashingCheckpointer:
        def __init__(self, inner):
            self._inner = inner

        def save(self, path, payload, force=True):
            self._inner.save(path, payload, force=force)
            if payload.get("epoch") == crash_epoch and path.endswith(".tmp"):
                self._inner.wait_until_finished()
                removed = False
                for root, _dirs, files in os.walk(path):
                    for f in files:
                        if not f.startswith("_"):   # a payload shard, not
                            os.remove(os.path.join(root, f))  # orbax metadata
                            removed = True
                            break
                    if removed:
                        break
                assert removed, f"nothing to corrupt under {path}"
                os.kill(os.getpid(), signal.SIGKILL)

        def wait_until_finished(self):
            self._inner.wait_until_finished()

    ck._checkpointer = lambda: CrashingCheckpointer(real_checkpointer())

    from geot_tpu.engine.train import parse_and_run

    parse_and_run(sys.argv[1:])


if __name__ == "__main__":
    main()
