"""Host->device transfer bandwidth + dispatch RTT through the axon tunnel.

The sustained north-star bench (bench.py config 7) measures ~150 img/s
regardless of whether the device program runs at 212 or 1 861 img/s — this
probe decomposes why: per-batch H2D bytes ride the tunnel (a remote TPU
behind an RPC relay), not a PCIe link. Reports MB/s at several transfer
sizes (payload varied per rep so the tunnel's identical-computation cache
cannot serve it) and the small-roundtrip RTT.

    python scripts/tunnel_probe.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev)

    # dispatch RTT: scalar compute roundtrip, warm jit
    one = jnp.ones((8, 8))
    f = jax.jit(lambda x, i: jnp.sum(x) + i)
    float(f(one, 0.0))
    t0 = time.perf_counter()
    reps = 10
    for i in range(reps):
        float(f(one, float(i)))     # varied arg defeats result caching
    rtt = (time.perf_counter() - t0) / reps
    print(f"small-roundtrip RTT: {rtt * 1e3:.1f} ms")

    for mb in (0.2, 1.0, 4.8, 19.3):
        n = int(mb * 1e6)
        base = np.random.randint(0, 255, (n,), np.uint8)
        x = jnp.asarray(base)
        x.block_until_ready()        # warm the path
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            base[0] = i              # new payload every rep
            y = jax.device_put(base)
            y.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"H2D {mb:5.1f} MB: {dt * 1e3:7.1f} ms  "
              f"{mb / dt:8.1f} MB/s")


if __name__ == "__main__":
    main()
