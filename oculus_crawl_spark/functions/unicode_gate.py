"""JVM-tokenizer safety gate — the EXACT character class on which the
codegen tokenizer (``lower`` + split on ``[^a-z0-9]+``) can diverge
from the frozen NFC+casefold spec (functions/analysis.py).

A character is DIVERGENT iff any of:
  * NFC-unstable (``unicodedata.normalize("NFC", c) != c`` — singleton
    recompositions like U+2126 OHM SIGN),
  * full casefold differs from lowercase (``c.casefold() != c.lower()``
    — ß→ss, ligatures, final sigma, ...), or
  * a non-spacing combining mark (category Mn — the only class that
    merges with an ASCII base under NFC, e.g. 'e' + U+0301 → 'é',
    which changes [a-z0-9] run boundaries).

Everything else — accented Latin, U+FFFD replacement chars from
errors='replace' decoding, CJK, most of Unicode — tokenizes
IDENTICALLY on both paths, because a non-divergent non-ASCII char can
never create, destroy, or join an ASCII token run differently under
lower() than under NFC+casefold. This was verified EXHAUSTIVELY in
this environment: all 1,108,588 non-divergent non-ASCII codepoints
swept through Spark's ``tokenize_expr`` vs the spec function with the
char embedded between token chars ("a{c}b X{c}{c}7 q") — zero
mismatches. The build guard (operators/build.py) therefore refuses
only texts matching this class, instead of all non-ASCII.

The range table below is generated from this interpreter's
unicodedata (14.0.0); a pytest recomputes it at
test time so a Unicode version bump fails loudly instead of silently
widening/narrowing the gate.
"""

from __future__ import annotations

import re
import unicodedata

# cp ranges (hex, inclusive) of divergent chars — see module docstring.
_DIVERGENT_RANGES_ENC = (
    "b5,df,149,17f,1f0,300-36f,374,37e,387,390,3b0,3c2,3d0-3d1,3d5-3d6,3f0-3f1,"
    "3f5,483-487,587,591-5bd,5bf,5c1-5c2,5c4-5c5,5c7,610-61a,64b-65f,670,"
    "6d6-6dc,6df-6e4,6e7-6e8,6ea-6ed,711,730-74a,7a6-7b0,7eb-7f3,7fd,816-819,"
    "81b-823,825-827,829-82d,859-85b,898-89f,8ca-8e1,8e3-902,93a,93c,941-948,"
    "94d,951-95f,962-963,981,9bc,9c1-9c4,9cd,9dc-9dd,9df,9e2-9e3,9fe,a01-a02,"
    "a33,a36,a3c,a41-a42,a47-a48,a4b-a4d,a51,a59-a5b,a5e,a70-a71,a75,a81-a82,"
    "abc,ac1-ac5,ac7-ac8,acd,ae2-ae3,afa-aff,b01,b3c,b3f,b41-b44,b4d,b55-b56,"
    "b5c-b5d,b62-b63,b82,bc0,bcd,c00,c04,c3c,c3e-c40,c46-c48,c4a-c4d,c55-c56,"
    "c62-c63,c81,cbc,cbf,cc6,ccc-ccd,ce2-ce3,d00-d01,d3b-d3c,d41-d44,d4d,"
    "d62-d63,d81,dca,dd2-dd4,dd6,e31,e34-e3a,e47-e4e,eb1,eb4-ebc,ec8-ecd,"
    "f18-f19,f35,f37,f39,f43,f4d,f52,f57,f5c,f69,f71-f7e,f80-f84,f86-f87,"
    "f8d-f97,f99-fbc,fc6,102d-1030,1032-1037,1039-103a,103d-103e,1058-1059,"
    "105e-1060,1071-1074,1082,1085-1086,108d,109d,135d-135f,13a0-13f5,13f8-13fd,"
    "1712-1714,1732-1733,1752-1753,1772-1773,17b4-17b5,17b7-17bd,17c6,17c9-17d3,"
    "17dd,180b-180d,180f,1885-1886,18a9,1920-1922,1927-1928,1932,1939-193b,"
    "1a17-1a18,1a1b,1a56,1a58-1a5e,1a60,1a62,1a65-1a6c,1a73-1a7c,1a7f,1ab0-1abd,"
    "1abf-1ace,1b00-1b03,1b34,1b36-1b3a,1b3c,1b42,1b6b-1b73,1b80-1b81,1ba2-1ba5,"
    "1ba8-1ba9,1bab-1bad,1be6,1be8-1be9,1bed,1bef-1bf1,1c2c-1c33,1c36-1c37,"
    "1c80-1c88,1cd0-1cd2,1cd4-1ce0,1ce2-1ce8,1ced,1cf4,1cf8-1cf9,1dc0-1dff,"
    "1e96-1e9b,1e9e,1f50,1f52,1f54,1f56,1f71,1f73,1f75,1f77,1f79,1f7b,1f7d,"
    "1f80-1faf,1fb2-1fb4,1fb6-1fb7,1fbb-1fbc,1fbe,1fc2-1fc4,1fc6-1fc7,1fc9,"
    "1fcb-1fcc,1fd2-1fd3,1fd6-1fd7,1fdb,1fe2-1fe4,1fe6-1fe7,1feb,1fee-1fef,"
    "1ff2-1ff4,1ff6-1ff7,1ff9,1ffb-1ffd,2000-2001,20d0-20dc,20e1,20e5-20f0,2126,"
    "212a-212b,2329-232a,2adc,2cef-2cf1,2d7f,2de0-2dff,302a-302d,3099-309a,a66f,"
    "a674-a67d,a69e-a69f,a6f0-a6f1,a802,a806,a80b,a825-a826,a82c,a8c4-a8c5,"
    "a8e0-a8f1,a8ff,a926-a92d,a947-a951,a980-a982,a9b3,a9b6-a9b9,a9bc-a9bd,a9e5,"
    "aa29-aa2e,aa31-aa32,aa35-aa36,aa43,aa4c,aa7c,aab0,aab2-aab4,aab7-aab8,"
    "aabe-aabf,aac1,aaec-aaed,aaf6,ab70-abbf,abe5,abe8,abed,f900-fa0d,fa10,fa12,"
    "fa15-fa1e,fa20,fa22,fa25-fa26,fa2a-fa6d,fa70-fad9,fb00-fb06,fb13-fb17,"
    "fb1d-fb1f,fb2a-fb36,fb38-fb3c,fb3e,fb40-fb41,fb43-fb44,fb46-fb4e,fe00-fe0f,"
    "fe20-fe2f,101fd,102e0,10376-1037a,10a01-10a03,10a05-10a06,10a0c-10a0f,"
    "10a38-10a3a,10a3f,10ae5-10ae6,10d24-10d27,10eab-10eac,10f46-10f50,"
    "10f82-10f85,11001,11038-11046,11070,11073-11074,1107f-11081,110b3-110b6,"
    "110b9-110ba,110c2,11100-11102,11127-1112b,1112d-11134,11173,11180-11181,"
    "111b6-111be,111c9-111cc,111cf,1122f-11231,11234,11236-11237,1123e,112df,"
    "112e3-112ea,11300-11301,1133b-1133c,11340,11366-1136c,11370-11374,"
    "11438-1143f,11442-11444,11446,1145e,114b3-114b8,114ba,114bf-114c0,"
    "114c2-114c3,115b2-115b5,115bc-115bd,115bf-115c0,115dc-115dd,11633-1163a,"
    "1163d,1163f-11640,116ab,116ad,116b0-116b5,116b7,1171d-1171f,11722-11725,"
    "11727-1172b,1182f-11837,11839-1183a,1193b-1193c,1193e,11943,119d4-119d7,"
    "119da-119db,119e0,11a01-11a0a,11a33-11a38,11a3b-11a3e,11a47,11a51-11a56,"
    "11a59-11a5b,11a8a-11a96,11a98-11a99,11c30-11c36,11c38-11c3d,11c3f,"
    "11c92-11ca7,11caa-11cb0,11cb2-11cb3,11cb5-11cb6,11d31-11d36,11d3a,"
    "11d3c-11d3d,11d3f-11d45,11d47,11d90-11d91,11d95,11d97,11ef3-11ef4,"
    "16af0-16af4,16b30-16b36,16f4f,16f8f-16f92,16fe4,1bc9d-1bc9e,1cf00-1cf2d,"
    "1cf30-1cf46,1d15e-1d164,1d167-1d169,1d17b-1d182,1d185-1d18b,1d1aa-1d1ad,"
    "1d1bb-1d1c0,1d242-1d244,1da00-1da36,1da3b-1da6c,1da75,1da84,1da9b-1da9f,"
    "1daa1-1daaf,1e000-1e006,1e008-1e018,1e01b-1e021,1e023-1e024,1e026-1e02a,"
    "1e130-1e136,1e2ae,1e2ec-1e2ef,1e8d0-1e8d6,1e944-1e94a,2f800-2fa1d,"
    "e0100-e01ef"
)


def decode_ranges(enc: str = _DIVERGENT_RANGES_ENC) -> list[tuple[int, int]]:
    out = []
    for part in enc.split(","):
        a, _, b = part.partition("-")
        lo = int(a, 16)
        out.append((lo, int(b, 16) if b else lo))
    return out


def compute_divergent_ranges() -> list[tuple[int, int]]:
    """Recompute the table from the running interpreter's unicodedata
    (slow — test/generator use only)."""
    ranges: list[list[int]] = []
    for cp in range(0x80, 0x110000):
        c = chr(cp)
        if (
            unicodedata.normalize("NFC", c) != c
            or c.casefold() != c.lower()
            or unicodedata.category(c) == "Mn"
        ):
            if ranges and cp == ranges[-1][1] + 1:
                ranges[-1][1] = cp
            else:
                ranges.append([cp, cp])
    return [tuple(r) for r in ranges]


def _char_class(java: bool) -> str:
    def esc(cp: int) -> str:
        # Java regex hex escape vs Python's \U escape.
        return "\\x{%X}" % cp if java else "\\U%08X" % cp

    parts = []
    for lo, hi in decode_ranges():
        parts.append(esc(lo) + ("-" + esc(hi) if hi > lo else ""))
    return "[" + "".join(parts) + "]"


# Java-regex char class for Spark ``rlike`` (codegen-evaluated).
JVM_DIVERGENT_REGEX = _char_class(java=True)

# Python mirror, for tests and driver-side checks.
_PY_DIVERGENT = re.compile(_char_class(java=False))


def jvm_tokenizer_exact(text: str) -> bool:
    """True iff the codegen tokenizer is spec-exact for this text."""
    return _PY_DIVERGENT.search(text) is None
