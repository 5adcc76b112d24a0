"""Does the axon platform compile two distinct programs concurrently from
two Python threads? If yes, bench warmup can overlap the 3D tile-program
and measure-kernel compiles (~50 s serial) with each other and with device
work."""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_prog(seed):
    # distinct scan-heavy programs (seed changes constants -> distinct HLO)
    def f(x):
        def body(c, _):
            c = jnp.tanh(c @ c.T * (1e-3 + seed * 1e-4) + seed)
            c = jax.nn.softmax(c, axis=-1)
            return c, jnp.sum(c)
        c = x
        for i in range(60):
            c = jnp.tanh(c @ c.T * (1e-3 + seed * 1e-4 + i * 1e-5) + seed)
            c = jax.nn.softmax(c, axis=-1)
        out, ss = jax.lax.scan(body, c, None, length=40)
        return out, ss
    return jax.jit(f)


def main():
    print("devices:", jax.devices())
    x = jnp.asarray(np.random.RandomState(0).rand(512, 512), jnp.float32)

    t0 = time.time()
    f1 = make_prog(1)
    f1(x)[1].block_until_ready()
    t_serial1 = time.time() - t0
    print(f"prog1 compile+run serial: {t_serial1:.1f}s")

    f2, f3 = make_prog(2), make_prog(3)
    t0 = time.time()
    done = {}

    def compile_one(name, f):
        tt = time.time()
        f(x)[1].block_until_ready()
        done[name] = time.time() - tt

    th2 = threading.Thread(target=compile_one, args=("p2", f2))
    th3 = threading.Thread(target=compile_one, args=("p3", f3))
    th2.start(); th3.start(); th2.join(); th3.join()
    wall = time.time() - t0
    print(f"progs 2+3 threaded: wall {wall:.1f}s, each {done}")
    print("PARALLEL" if wall < 1.6 * t_serial1 else "SERIAL-ISH")


if __name__ == "__main__":
    main()
