"""Anti-hang / anti-crash fuzz for the PDF parser (round 5).

The issue-848 lexer hang (catastrophic regex backtracking on a NUL run
followed by a non-token byte) showed that adversarial BYTES — not just
adversarial object graphs — can stall the kernel. A 100 TB crawl corpus
WILL contain every such byte pattern, and one hung task stalls a whole
Spark stage. This suite mutates real generated PDFs deterministically and
requires the extraction entry point to return an error row (never raise,
never hang) within a wall budget per payload.
"""

import random
import signal

import pytest

from pdfplumber_spark.kernel.pdfgen import make_pdf
from pdfplumber_spark.plans.extract import _payload_to_text_rows

WALL_BUDGET_S = 15


class _Hang(Exception):
    pass


def _alarm(_s, _f):
    raise _Hang()


def _base_pdfs():
    rng = random.Random(5)
    texts = [
        {"x": 72.0, "top": 72.0 + 15 * i, "size": 12,
         "text": f"line {i} " + " ".join(rng.choices("abc def ghi".split(), k=6))}
        for i in range(12)
    ]
    plain = make_pdf([{"width": 612, "height": 792, "texts": texts}])
    imaged = make_pdf([{
        "width": 612, "height": 792, "texts": texts[:3],
        "images": [{"x": 72, "top": 300, "w": 90, "h": 70, "pw": 9,
                    "ph": 7, "seed": 3, "format": "ccitt", "channels": 1}],
    }])
    return [plain, imaged]


def _mutations(data: bytes, rng: random.Random):
    n = len(data)
    yield data[: n // 3]                       # hard truncation
    yield data[: n - 7]                        # trailer clipped
    yield data + b"\x00" * 9000 + b"("         # the issue-848 shape
    yield b"\x00" * 4096 + data                # junk prefix (repair shape)
    for _ in range(8):                         # random splices
        i, j = sorted(rng.randrange(n) for _ in range(2))
        yield data[:i] + bytes(rng.randrange(256) for _ in range(16)) + data[j:]
    for _ in range(8):                         # random byte flips
        m = bytearray(data)
        for _ in range(24):
            m[rng.randrange(n)] ^= rng.randrange(1, 256)
        yield bytes(m)
    # corrupt the first stream body while keeping structure plausible
    k = data.find(b"stream\n")
    if k != -1:
        yield data[: k + 7] + bytes(rng.randrange(256) for _ in range(64)) + data[k + 7:]
    # deflate-bomb-ish: a stream whose Length lies
    yield data.replace(b"/Length ", b"/Length 9", 1)


@pytest.mark.parametrize("base_idx", [0, 1])
def test_mutated_payloads_never_hang_or_raise(base_idx):
    rng = random.Random(99 + base_idx)
    data = _base_pdfs()[base_idx]
    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        for mi, mut in enumerate(_mutations(data, rng)):
            signal.alarm(WALL_BUDGET_S)
            try:
                rows = _payload_to_text_rows(f"fuzz://{base_idx}/{mi}", mut,
                                             layout=False)
            except _Hang:
                pytest.fail(f"mutation {mi} exceeded {WALL_BUDGET_S}s wall")
            finally:
                signal.alarm(0)
            # contract: rows always come back, statuses are in-domain
            assert rows, f"mutation {mi} returned no rows"
            assert all(r[5] in ("ok", "error") for r in rows), rows[:2]
    finally:
        signal.signal(signal.SIGALRM, old)


def test_ccitt_garbage_streams_error_not_hang():
    """Random bytes through the CCITT decoder either decode or raise
    CCITTError quickly — never spin."""
    from pdfplumber_spark.kernel.ccitt import CCITTError, ccittfax_decode

    rng = random.Random(123)
    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        for i in range(30):
            blob = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 400)))
            signal.alarm(10)
            try:
                ccittfax_decode(blob, columns=64, rows=0, k=-1)
            except (CCITTError, ValueError):
                pass
            except _Hang:
                pytest.fail(f"ccitt blob {i} hung")
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_jpeg_mutations_fail_fast_not_hang():
    """Mutated baseline-JPEG streams must decode or raise quickly —
    the entropy loop has no unbounded states."""
    import numpy as np

    from pdfplumber_spark.kernel.jpeg import jpeg_decode, jpeg_encode_gray

    rng = random.Random(7)
    base = jpeg_encode_gray(
        np.linspace(0, 255, 24 * 16).reshape(16, 24).astype(np.uint8)
    )
    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        muts = [base[: len(base) // 2], base[:-4], b"\xff\xd8" + base[6:]]
        for _ in range(20):
            m = bytearray(base)
            for _ in range(6):
                m[rng.randrange(len(m))] ^= rng.randrange(1, 256)
            muts.append(bytes(m))
        for i, mut in enumerate(muts):
            signal.alarm(10)
            try:
                jpeg_decode(mut)
            except ValueError:
                pass  # JPEGError subclasses ValueError
            except _Hang:
                pytest.fail(f"jpeg mutation {i} hung")
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)
