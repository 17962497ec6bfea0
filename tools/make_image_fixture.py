"""Generate fixtures/images.parquet: tiny deterministic PPM (P6) images as
binary payloads + typed metadata — the committed real-bytes fixture for the
mm_image_decode contract (the driver corpus has no image column; PPM needs
no image library on either side).

Pixel law (pinned; the oracle never regenerates it, it only re-reads the
bytes): value(x, y, channel) = (7x + 13y + 29c + 31·img_id) mod 256.

Run: PYTHONPATH=/root/repo python tools/make_image_fixture.py
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_IMAGES = 200
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "images.parquet")


def ppm_bytes(img_id: int) -> tuple[int, int, bytes]:
    w = 8 + img_id % 16
    h = 8 + (3 * img_id) % 16
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    px = ((7 * x + 13 * y + 29 * c + 31 * img_id) % 256).astype(np.uint8)
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return w, h, header + px.tobytes()


def main() -> None:
    rows = [ppm_bytes(i) for i in range(N_IMAGES)]
    table = pa.table(
        {
            "img_id": pa.array(range(N_IMAGES), pa.int64()),
            "width": pa.array([r[0] for r in rows], pa.int32()),
            "height": pa.array([r[1] for r in rows], pa.int32()),
            "mime": pa.array(["image/x-portable-pixmap"] * N_IMAGES),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {N_IMAGES} images, {os.path.getsize(OUT)} bytes -> {OUT}")


if __name__ == "__main__":
    main()
