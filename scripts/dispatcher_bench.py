"""Serving DISPATCHER ceiling: requests/s the continuous-batching front-end
can coalesce, pad, and demux with a free (instant) engine.

The relay-bound serving numbers (docs/BENCHMARKS.md) measure the link, not
the design; this isolates the dispatcher itself, so the design's ceiling is
min(dispatcher req/s, engine img/s) on production hardware.

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/dispatcher_bench.py [batch] [clients] [reqs_per_client]
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from f8net_tpu.engine.serve import ServingEngine


class _InstantEngine:
    """Engine stub returning without device work: logits = row sums."""

    def __call__(self, x):
        x = np.asarray(x)
        return np.stack([x.reshape(x.shape[0], -1).sum(1)] * 2, axis=1)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reqs = int(sys.argv[3]) if len(sys.argv) > 3 else 400

    img = np.zeros((224, 224, 3), np.uint8)
    for buckets, ring in (
        (None, 0),
        ((8, 16, batch), 0),
        (None, 16 * batch),
        ((8, 16, batch), 16 * batch),
    ):
        srv = ServingEngine(
            _InstantEngine(), batch_size=batch, max_wait_ms=2.0,
            buckets=buckets, ring_capacity=ring,
            image_shape=(224, 224, 3), image_dtype=np.uint8,
        ).start()
        lat = []
        lock = threading.Lock()

        def client():
            for _ in range(reqs):
                t0 = time.perf_counter()
                srv.infer(img)
                with lock:
                    lat.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        srv.stop()
        lat = np.array(sorted(lat))
        total = n_clients * reqs
        print(
            f"dispatcher b{batch} buckets={buckets or '-'} "
            f"ring={ring or '-'} clients={n_clients}: "
            f"{total / wall:9.1f} req/s  p50 {lat[len(lat)//2]*1e3:6.2f} ms  "
            f"p99 {lat[int(len(lat)*0.99)]*1e3:6.2f} ms  "
            f"batches {srv.stats['batches']} "
            f"(ring {srv.stats['ring_batches']}/copy {srv.stats['copy_batches']})"
        )


if __name__ == "__main__":
    main()
