"""Regenerate tests/data/ocr_fixture.bin.gz from the reference's
example data file (src/distance/example/ocr.rs — two OCR byte
sequences used by its large-input levenshtein test,
src/distance/levenshtein.rs:2140-2162).  Vendored so the golden test
runs without /root/reference present."""

import gzip
import os
import re
import struct

REF = "/root/reference/src/distance/example/ocr.rs"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "ocr_fixture.bin.gz")


def main() -> None:
    src = open(REF).read()
    arrays = []
    for m in re.finditer(r"\[u8; \d+\] = \[(.*?)\];", src, re.S):
        arrays.append(bytes(int(x) for x in re.findall(r"\d+", m.group(1))))
    assert len(arrays) == 2
    assert (len(arrays[0]), len(arrays[1])) == (106514, 107244)
    payload = (struct.pack("<II", len(arrays[0]), len(arrays[1]))
               + arrays[0] + arrays[1])
    with gzip.open(OUT, "wb", compresslevel=9) as f:
        f.write(payload)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
