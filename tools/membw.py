"""Aggregate memory bandwidth vs process count: each worker memcpys a
256MB numpy buffer repeatedly for ~2s; aggregate GB/s reported."""
import multiprocessing as mp, time, sys
import numpy as np

def worker(q, seconds):
    a = np.random.bytes(256 * 1024 * 1024)
    src = np.frombuffer(a, dtype=np.uint8)
    dst = np.empty_like(src)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    # bytes moved = read + write per copy
    q.put(2 * len(src) * n / dt)

if __name__ == "__main__":
    for nproc in (1, 4, 8, 16, 32):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q, 2.0)) for _ in range(nproc)]
        [p.start() for p in ps]
        rates = [q.get() for _ in ps]
        [p.join() for p in ps]
        print(f"procs={nproc:2d} aggregate={sum(rates)/1e9:7.1f} GB/s "
              f"per-proc={sum(rates)/len(rates)/1e9:5.1f} GB/s")
