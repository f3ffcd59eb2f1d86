import jax, jax.numpy as jnp, time

N = 1024


def timeit(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    print(f"{name}: {(time.perf_counter()-t0)*1e3:.2f} ms", flush=True)


x0 = jax.random.normal(jax.random.key(0), (N, 8))
a = jax.random.normal(jax.random.key(1), (N, 8))

for steps in [100, 1000]:
    def run(x, steps=steps):
        def body(x, _):
            return x * 0.999 + 0.001 * a, None
        x, _ = jax.lax.scan(body, x, None, length=steps)
        return x
    timeit(f"1-op scan x{steps}", run, x0)

for steps in [100, 1000]:
    def run(x, steps=steps):
        def body(x, _):
            for _ in range(10):
                x = jnp.sin(x * 0.999) + 0.001 * a
            return x, None
        x, _ = jax.lax.scan(body, x, None, length=steps)
        return x
    timeit(f"10-op scan x{steps}", run, x0)

# bigger arrays, same op counts
y0 = jax.random.normal(jax.random.key(2), (N, 1024))
b = jax.random.normal(jax.random.key(3), (N, 1024))
def runbig(y):
    def body(y, _):
        for _ in range(10):
            y = jnp.sin(y * 0.999) + 0.001 * b
        return y, None
    y, _ = jax.lax.scan(body, y, None, length=100)
    return y
timeit("10-op scan x100 on (1024,1024)", runbig, y0)
