/* Native streaming-runtime primitives for idsp_tpu.
 *
 * A single-producer/single-consumer lock-free byte ring buffer with
 * C11 atomics plus blocking (sleep-polling) transfer helpers.  This is
 * the host-side analog of the reference platform's double-buffered DMA
 * acquisition (the Stabilizer instruments the reference crate serves
 * stream samples through exactly such a ring; cf. idsp README.md:12
 * and the block-boundary state carry discipline of src/hbf.rs:93-101):
 * a producer (acquisition driver / socket reader) deposits raw sample
 * bytes without taking any lock, and the Python StreamExecutor
 * (idsp_tpu/runtime.py) pops fixed-size blocks to feed the jitted
 * device chain.  ctypes calls release the GIL, so the blocking reader
 * gives true producer/consumer overlap from Python threads.
 *
 * Build: cc -O2 -shared -fPIC -o libstreamrt.so stream_rt.c -lpthread
 * (driven by idsp_tpu/runtime.py with a content-hash rebuild stamp).
 */

#include <stdatomic.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef struct {
    uint8_t *buf;
    uint64_t cap;   /* power of two, bytes */
    uint64_t mask;
    /* monotonically increasing byte counters; position = counter & mask.
     * 64-bit so they never wrap in practice. */
    _Atomic uint64_t head; /* producer writes, consumer reads */
    _Atomic uint64_t tail; /* consumer writes, producer reads */
    _Atomic int closed;
} rb_t;

static uint64_t round_pow2(uint64_t v) {
    uint64_t c = 1;
    while (c < v) c <<= 1;
    return c;
}

rb_t *rb_create(uint64_t capacity) {
    rb_t *rb = (rb_t *)calloc(1, sizeof(rb_t));
    if (!rb) return NULL;
    rb->cap = round_pow2(capacity < 64 ? 64 : capacity);
    rb->mask = rb->cap - 1;
    rb->buf = (uint8_t *)malloc(rb->cap);
    if (!rb->buf) {
        free(rb);
        return NULL;
    }
    atomic_store(&rb->head, 0);
    atomic_store(&rb->tail, 0);
    atomic_store(&rb->closed, 0);
    return rb;
}

void rb_destroy(rb_t *rb) {
    if (!rb) return;
    free(rb->buf);
    free(rb);
}

uint64_t rb_capacity(rb_t *rb) { return rb->cap; }

uint64_t rb_readable(rb_t *rb) {
    return atomic_load_explicit(&rb->head, memory_order_acquire) -
           atomic_load_explicit(&rb->tail, memory_order_acquire);
}

uint64_t rb_writable(rb_t *rb) { return rb->cap - rb_readable(rb); }

void rb_close(rb_t *rb) {
    atomic_store_explicit(&rb->closed, 1, memory_order_release);
}

int rb_closed(rb_t *rb) {
    return atomic_load_explicit(&rb->closed, memory_order_acquire);
}

/* Copy n bytes into the ring if space allows; returns bytes written
 * (0 or n — never partial, so frame boundaries stay intact). */
uint64_t rb_write(rb_t *rb, const uint8_t *src, uint64_t n) {
    uint64_t head = atomic_load_explicit(&rb->head, memory_order_relaxed);
    uint64_t tail = atomic_load_explicit(&rb->tail, memory_order_acquire);
    if (rb->cap - (head - tail) < n) return 0;
    uint64_t pos = head & rb->mask;
    uint64_t first = rb->cap - pos;
    if (first >= n) {
        memcpy(rb->buf + pos, src, n);
    } else {
        memcpy(rb->buf + pos, src, first);
        memcpy(rb->buf, src + first, n - first);
    }
    atomic_store_explicit(&rb->head, head + n, memory_order_release);
    return n;
}

/* Copy n bytes out of the ring if available; returns bytes read (0 or n). */
uint64_t rb_read(rb_t *rb, uint8_t *dst, uint64_t n) {
    uint64_t tail = atomic_load_explicit(&rb->tail, memory_order_relaxed);
    uint64_t head = atomic_load_explicit(&rb->head, memory_order_acquire);
    if (head - tail < n) return 0;
    uint64_t pos = tail & rb->mask;
    uint64_t first = rb->cap - pos;
    if (first >= n) {
        memcpy(dst, rb->buf + pos, n);
    } else {
        memcpy(dst, rb->buf + pos, first);
        memcpy(dst + first, rb->buf, n - first);
    }
    atomic_store_explicit(&rb->tail, tail + n, memory_order_release);
    return n;
}

static void sleep_us(long us) {
    struct timespec ts;
    ts.tv_sec = us / 1000000;
    ts.tv_nsec = (us % 1000000) * 1000;
    nanosleep(&ts, NULL);
}

/* Blocking write of exactly n bytes (sleep-polling).  Returns 1 on
 * success, 0 on timeout or when the ring is closed. */
int rb_write_all(rb_t *rb, const uint8_t *src, uint64_t n,
                 int64_t timeout_us) {
    int64_t waited = 0;
    if (n == 0) return 1; /* nothing to transfer is success */
    while (!rb_write(rb, src, n)) {
        if (rb_closed(rb)) return 0;
        if (timeout_us >= 0 && waited >= timeout_us) return 0;
        sleep_us(50);
        waited += 50;
    }
    return 1;
}

/* Blocking read of exactly n bytes.  Returns 1 on success, 0 on
 * timeout or when the ring is closed AND drained. */
int rb_read_all(rb_t *rb, uint8_t *dst, uint64_t n, int64_t timeout_us) {
    int64_t waited = 0;
    if (n == 0) return 1;
    while (!rb_read(rb, dst, n)) {
        if (rb_closed(rb) && rb_readable(rb) < n) return 0;
        if (timeout_us >= 0 && waited >= timeout_us) return 0;
        sleep_us(50);
        waited += 50;
    }
    return 1;
}
