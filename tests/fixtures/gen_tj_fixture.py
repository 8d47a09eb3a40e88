#!/usr/bin/env python
"""Generate tests/fixtures/tj_kerned.pdf — a two-column page whose word x
positions are determined ENTIRELY by a /Widths array and TJ kerning
adjustments (no per-word Td), so the fixture exercises the glyph-width
x-advance path of sources/minipdf.py.

Layout (font size 10, every glyph 1000/1000 wide -> 10 units per char,
spaces included):

    line y=700: [(AB CD) -5000 (EF)] TJ from x=50
        AB @ x=50, CD @ x=80 (50 + 2*10 + 10), EF @ x=150
        (50 + width("AB CD")=50 -> 100, kern -5000 -> +50 -> 150)
    line y=680: [(GH) -7000 (IJ KL)] TJ from x=50
        GH @ x=50, IJ @ x=140 (50+20 -> 70, kern +70 -> 140), KL @ x=170

    xs sorted: [50, 50, 80, 140, 150, 170]; upper median = xs[3] = 140
    -> left column {AB, CD, GH, IJ}, right column {EF, KL}

A reader using the old fixed CHAR_ADVANCE=0.5 fallback would place CD at
65, EF at 125, IJ at 130, KL at 145 — a DIFFERENT median split — which is
exactly the distortion the /Widths support removes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def build() -> bytes:
    widths = " ".join(["1000"] * 95)  # chars 32..126, all 1000/1000 wide
    content = (
        b"BT /F1 10 Tf 50 700 Td [(AB CD) -5000 (EF)] TJ ET\n"
        b"BT /F1 10 Tf 50 680 Td [(GH) -7000 (IJ KL)] TJ ET"
    )
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier "
            b"/FirstChar 32 /Widths [%s] >>" % widths.encode()
        ),
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 400 750] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tj_kerned.pdf")
    with open(path, "wb") as f:
        f.write(build())
    print(f"wrote {path}")
