"""MPEG-1 audio (Layer I / II / III) sample decode — stdlib + numpy only.

Closes the MP3 leg of the sample-decode integration point
(``multimodal.decode_media``'s historical ``decoder='raise'`` marker;
the reference engine — graphite-project/whisper — has no media surface
at all, this belongs to the beyond-reference training-data-pipeline
scope).  What is REAL here, implemented from the public ISO 11172-3
structure with no codec library:

* frame walking: sync parse, MPEG-1 header fields, bitrate/samplerate
  tables, padding, frame lengths, ID3v2 skip (syncsafe), ID3v1 trailer
  skip, and protection-bit CRC-16 VERIFICATION over each layer's
  protected region (Layer I: allocations; Layer II: allocations +
  scfsi; Layer III: side info);
* **Layer I**: full bitstream decode — 4-bit allocations (intensity
  bound for joint stereo), 6-bit scalefactors, 12 granules of MSB-
  inverted two's-complement codes, exact requantization
  ``s''' = 2^nb/(2^nb-1) * (s'' + 2^(1-nb))`` and the 2^(1-i/3)
  scalefactor table;
* **Layer II**: full bitstream decode — the four allocation tables
  (27/30/8/12-subband), scfsi-coded scalefactor sharing, grouped
  (3/5/9-step triplet) and ungrouped codes, class requantization
  ``s''' = C*(s''+D)`` with C = 2^nb/steps and
  D = (2^(nb-1) - (steps-1)/2)/2^(nb-1) (derived, not tabled);
* **Layer III**: side-info parse (both granules, both block layouts),
  bit-reservoir accounting, scalefactor decode (scalefac_compress
  slen pairs + scfsi band sharing), the analytic IMDCT bank (36-point
  long / 3x12-point short with the sine windows, all four block
  types), alias-reduction butterflies (the eight published ci
  coefficients), overlap-add, frequency inversion — run end to end on
  every decodable granule;
* the ISO polyphase synthesis structure: 1024-entry V fifo, the 64x32
  ``cos((16+i)(2k+1)pi/64)`` matrixing, the V->U interleave, 512-tap
  window, 16-fold accumulation, per channel.

Two DOCUMENTED gates (returning None -> NULL stats, never crashes):

1. **Layer III Annex-B table VALUES.**  Nonzero-spectrum decode is
   fully implemented — region-selected big_values Huffman pairs with
   linbits escapes and sign bits, count1 quads with the overshoot
   rule, stored scalefactors with scfsi band-group reuse, preflag,
   subblock gains, the requantization gain ladder, short-block
   reorder, m/s stereo, and the bit reservoir — but the Huffman code
   tables and scalefactor-band partitions are published numeric table
   data this repo refuses to transcribe from memory (a mistyped entry
   would be silently wrong: the container has no reference decoder or
   conformance streams to check against).  Supply them via
   :func:`set_l3_tables` to decode real nonzero streams; the
   machinery is round-trip verified against an independent encoder
   with self-consistent tables (tests/test_mp3_decoder.py).
   All-zero-spectrum granules (digital silence — what the oracle
   synthesizes) decode exactly through the full IMDCT/synthesis path
   with NO tables.  Intensity stereo is real for EVERY block layout:
   long blocks (is_pos from the right-granule scalefactors,
   tan(pos*pi/12) ratios, is_pos-7 m/s fallback, the coded-region
   bound from the right channel's huffman end), start/stop windows
   (long layout, same bound), and SHORT/mixed blocks — per-window
   zero-part detection by top-down scan of the right channel's
   reordered spectrum, per-window is_pos from the short scalefactors
   (band 12 reusing band 11's, the same reference-decoder convention
   as long band 21), with mixed blocks extending intensity into the
   long bands only when every short window of the right channel is
   silent (round-tripped against the independent frame assembler in
   tests/test_mp3_decoder.py).
2. **The 512-tap prototype window** (ISO Tables 3-B.3/3-C.1) is the
   same class of irreducible numeric data.  The shipped window pair is
   DESIGNED for the identical structure by deterministic alternating
   least squares (tools/gen_mp3_window.py, ~-78 dB reconstruction
   error, the same near-PR regime as the ISO pair — the MPEG-1
   matrixing kernel uses (16+i) where TDAC would need (16+i+0.5), so
   exact PR is impossible for ANY window).  Round trips against this
   repo's own analysis encoder are near-exact and tested; decoding a
   stream from a REAL ISO-windowed encoder is structurally correct but
   not bit-conformant until the ISO table is supplied via
   ``set_iso_windows()``.

Free-format (bitrate index 0), MPEG-2/2.5 headers, and corrupt
structure return None.  Everything is closure-built so Spark tasks
ship the decoder by value (same convention as the PNG/JPEG/FLAC
decoders in operators/multimodal.py).
"""

from __future__ import annotations

import base64
from typing import Callable

import numpy as np

# ----------------------------------------------------------------- #
# substitute prototype window pair — frozen output of
# tools/gen_mp3_window.py (deterministic; see module docstring)
# ----------------------------------------------------------------- #

ANALYSIS_WINDOW_B64 = (
    "Czqn2IeS3D4ArLiArhQZPwAAJmM/JR8/AMQy81D+Iz+ABelOlrAmPwBQxykEKTY/2KN+2oia"
    "MD8Avtrn3IQrP5A2DCcvAC0/APy0HBpbKj8AL7dLe5I0PwBmvOQ12TM/AMhb3jCLOz+AdMJ8"
    "inw0PwDgJyx/qjM/AB3OeY7YMT8AJhIgWcowPwBbNbVDAjU/APDR6YKdMT8AWD7QFWsoPwDC"
    "vUfYVCg/AHynR+/sND8AWEHi+lEDvwB0lOfHGSg/AEf+vVVQMT8AFAv5cKAzPwD2Qu8LwSI/"
    "ALQzY9gbEb8A+yaBCVIpPwAAYq/QxxQ/AIso8coXEz8A4PBE0RL9PgDgUVMwehg/APDNaZVA"
    "9j4A2LIEXLDsPoAZXmoVsRk/AE4fAUBW3D5g7VgjjpkEvwBV5rFCpha/wCzOAcKbJD8AwFe9"
    "ffDevgDKA1p5Mg4/KCNG3MOkDr8AiMSW1XsLPwDeSI56Fhm/ACS3+P838z4At67yMqUpPwDw"
    "S1BEBPq+AAAAAAAAjbwAmGo0C9UGvwASiljmRSW/QC9g8JXsJj8AMdUR6SJAvzDkR8KgNCg/"
    "gDJuYKMNE7/gQL7Lvv8TvwDMO2A+gwU/gMVVpdiwIr8AEfgH+ggLvwA+HFxD+gW/AClqOV6a"
    "CT8gZTQewPP/PgAYkSmgyw4/gNP5YkuaDb8A6AH6wS33vsAb7a3Arxg/gGamwtKOID8AH7Ay"
    "M5wPP4AfjpysjRI/AO0cQOwo9r6A44VmPks1PwA6Cc9A5NE+ANEbSkPoJj/A7jOZuJEuPzwM"
    "YI3+Pjo/AIYgPflUB7+AkkSwucc6vwCzAzuXiCA/MOoWP1pnGD8AOxGHLk0nPwCuhNXVsCA/"
    "ADT5UqVqFb+gtNA8hgYQvwCgmJPJguS+AN6nkM1bMD8w1MEM4w0RPyBe/74T6Sk/OFkG+/T1"
    "Hj8AQAucpdYjv6zpBt/u3DG/qPkKfs1NKL+AnBl/OUslPwCUE6EyXhG/BTMbfVM9Ir8A0kmi"
    "IeQHPwC7lFCCAhC/AJx5hsB8IL8ARAnqsdD5PgCaU2TfCxA/kEN4J393ID+A7dLFjwYIP0AK"
    "zg8PLRM/ADi2XMyvEL8AHjmESZPxPgD5+YmzsBE/AKAUdfJ40r7A9fB2ejIrPwCIrmBFrRY/"
    "AMC/6b1GEr8AbSebZXMVPwBlvrh1ViS/AKUGr85WKz8AAAAAAIDGvIDWIPtZnjC/wGUiWlw3"
    "KD8AeHIoTKUWP4C+0q6VKzA/QEKXgZNSE79Ak76RSpEhP0BoOAWsSys/AIDHEduUuL7YROki"
    "zG48P4DrLIGPaQ0/YAn24e2SI78AqLMz4prbPsBNFoCLKhI/AF4jEiKoIj8AIKR4Yi/JvgAp"
    "S+5KFA0/ACAeoD9w974APAQtqa8Ev+ChBT9biyQ/gLSTOPo0Cr9A2i+S7NsQvwBXSMNz/AU/"
    "gDng1cl+QD/AqH+jD4wwP8AzVqovVEA/SFrGvjlYRz9Ayp0DRh85P4BAimiG1FE/gM4rLUcP"
    "Uj9Q5CkpTTRPP8BqLamQt1Y/MAp62mNZWD+g6dHNsNJVP8EOt081QFw/mNTTCDZ8Yj8QDmpv"
    "7L9hP62iO7pXFmQ/GBsN2OBeZT9i1hLRfxpoP+6ontvBjmg/UgcU9ToLbT/O80Py4V1rP1tb"
    "P4g5J3E/eGfXe/d6cj/aO5WhA1x0P/jFSvc5lXU/UKyFss56dz+YA0k0a994Pybsn5J6jXo/"
    "mJ1Fv7aCfD8hPJ83YiN+P5oQPpkLM4A/DGBXi1uZgT8XnH6PtkeCPxofqQ11VYM/WtPeAaRW"
    "hD9gvbtjBnqFP/nit6BWioU/yFURDSNShz9+OFtXMgqIP9TwkxCXS4g/ruvQ7ULKiD9grC5s"
    "qrWJPwAAAAAAAIe8ksoo1RIVij8d3ZiZE0eKP2JC9Io4iIo/rz3kMmWJij9EI2JPMdKJPzwO"
    "r3I7+Ig/sq/z6M23hz84cWLv0OyGP1n5Ng/YQoU/+qc4xdlagz92z/iSQVaBP0wJ9TEtUH0/"
    "uu2ZV+SQdz9A1GH1n6BwP4w1f+SoVGA/AOAn8QMP6b6g6T8hr6pjv5grR+hCAnW/dzmKOK7I"
    "gL9k2fY7dzCHv80UbgncNY6/ymmFisrbkr8MY7Aw6jCXv2MGb5zFj5u/rdLBMik3oL/W2LEn"
    "pe6iv4aQQv9f06W/1l4bdHDBqL9IqI2bzgysv45c4F3WZK+/9hAlPRJ2sb/9+BkcbFSzvyNU"
    "0P5fWrW/sc9vuZ88t7+mtaBrbZq5v2QJRPr4y7u/tBStRfQGvr9HraFoszXAv1WvfL+hgcG/"
    "pFTOjy62wr9ZQn5LvRLEv9wdwnWDZMW/jW/59DTVxr9/9UV7qjjIv2iOvVtwr8m/YHwVSY8m"
    "y78jjj3Hp6XMv+i4nTKHKc6/imJ1vKqwz7+BISI8kp/Qv3C82+ZkZNG/SWN1RMkq0r8NNWgZ"
    "jPHSv+Wx1ZA8ttO/ZZVBe6F61L9y8HsCFD7Vv8z3rPg0/dW/eGW+dFS91r8Ejxq4g3TXvxEo"
    "cV8TKti/eqH1yETX2L/wUy0rMIrZv7by7UmAMNq/AAAAAAAgorzSbWDFTGHbv3IQ8hVRANy/"
    "B3Y2YPOB3L/V1igM8/7cv2mcuuIufN2/wYdo/tfs3b+wgClhuFPev3PdBPAbr96/tbKXXl3+"
    "3r9bwXWRBEbfv3M17A+kf9+/uHWzaMey37+TGxqMktnfv5o62aLD8t+/NlgeiOr/37+I8clG"
    "MQLgP9Y30Ui7+98/fXhUy93p3z9Qc9cQBcffP4klti6foN8/u+H6zi1q3z/igr5fIyrfPwBP"
    "Ulwy3d4/gvjUSf6E3j+AzxM45yXeP2OSMwzgv90/FeWh/S1N3T+T3mzdz9LcP7iOszR8Stw/"
    "y2iheGa92z+vWl6a3yvbP2R7CNRpido/JQ30D83n2T9HUTChJD7ZP3R6xVy9lNg/WBu6IEnh"
    "1z+V4puu5yvXPzPXmxBybNY/ZoY74Oiy1T+6sGf1menUPxCkygMiL9Q/c2R5+Kdp0z/v5WE3"
    "CqPSP+I5+/9i2tE/28BPD+EX0T804Lf8Z1DQP3ih6JgPFM8/3F/EN8yUzT8Y6hi1BxPMPy6s"
    "anjPmso/BppTKlMhyT/ohU9FxbLHPzgxA3fWScY/9oAtkrXzxD9C9ajcIZbDP8VczrD2RcI/"
    "KGaL4XMEwT9z+LiCJpy/P9U9CjEvOL0/og1J5S8Buz/GPav6kKe4P0xif+Ctq7Y/Ws6iQSWh"
    "tD8AAAAAAMChvA9TT9rj7LA/H+Gl+HN5rj9Ol3vdoSSrP4E9W4PLDag/b9fhX8n9pD/XaS7D"
    "4FiiPzwR3aF52J8/uS1MHYvPmj9DhJMhckiWP5omU+ZBZZI/6RccGpczjT8tpm40Y9qFP6yV"
    "9UixKn8/WHS5mGH/cz/gBKdmkPFhPwBERnW2IwM/YKhJDS0wYr9QzsypZu1vvwEgw3B5Jna/"
    "wML3mr6BfL8q7PnIE9mAv6GuUHiyAYO/2tlEPZ5whL8H1zAN1e+Fvy+eu1x784a/5XYaCqA3"
    "h7+mUD3Yc8SIv7A0wDnnmYi/+HIlfTM7ib8Qpxhu2gOJv51+lk3Myoi/njZWa67JiL/IMgUf"
    "E/+Hv+Jf60yKYYi/2BhRQKnjhr8snQWN1j+Gv7Gf3AshQYW/Uh/z//SXhL8Cs3bG3XWDvz3M"
    "cE8OLIK/HD1r17tDgr++2+xoEhuBv/j/JzPxyn+/lKEGPsKgfr+6ZUhETw59v2BWvwcXGXu/"
    "gD6fsnH7eL/MY9YabsB3v9ET80RWsnS/OLxQcpoMdL9Y5FNx0Ztxv2mA86jgonC/Eq8EqyQI"
    "bb9t+kBs9vprv0ijzGGkc2m/qDgs2tW8Z7/UT43q6eRjvzbMT4Kk7mO/wOoYWzdYYL9g3QA6"
    "C/havwDyJdjzpFi/QCAH5XU9V78AXnlvPqBUvwAAAAAAcMQ8gOr0G56ITr9AN8fcb65Iv4B8"
    "OzDa8Eu/IGO19/fgPr+YTbMOBPY7v+A3J6KUfiy/QLEp1epwQL+AteSwTwQ6vzAND+fSHzK/"
    "AAanHiK7Jb/whvlpfKEtv9jpUnOwWSy/yCu2oXraAz9AZUUkiN8jvwB84/X08e8+ADhKuk1T"
    "BT+AAYzfkJ8cPwAQbC5LRO4+wMdqRTgZFb8AaoH7r4QBv+CLkpJEDxi/AFmQvzMFKD8AEC/s"
    "c0i4PqDT/N67XT2/gNT6VwTuEr8Ay8t9tyscvwCIf/W2SC4/ANBokv91GD8A35gwSA8sv/DN"
    "MKrc7Ts/ABP4X3dkHr+AGQYW8ss5vwC0A7d7rSk/ALPuzTZ/Dr8AJMFygBoevwD2qzf7fzu/"
    "kAHUIMyLKz8AyC2JwgbnvkhgVIPZkji/gHuneGquNr9o4v7saF4wvxglv5txoSM/AKb5D9WL"
    "7z4AEGPYQ1P1PoBro8G3j7Q+ABT3jXauEr8AqJX+9OoNP4CckjPeOwS/QP7J8zJbML8A2rWi"
    "J5cUP/CUhksOxCi/KCnstP7SGb+Awy6gzOgAP8CK13jfmSu/gBoh1htqKb8AqJZrRvUNv4B4"
    "orXDyCq/0NN0gp85Ij8AK55oHOo2vwAss5UVEEA/wECTdOBCKL8AVBRS+P0WPwAGUMMcriK/"
    "AAAAAAC8rLyANqDFItYwPwBsB4DLn/A+QJoiofZXIb9AWcAd0GQ0PwDqbpBU0Am/wNo+gQSr"
    "Br8AdboBDCsvvwBguHKLcdk+wIDLaG7UEb8QjvuvYoIFP4D+ni+j6BK/8Bax31hEKr8YTZPa"
    "ByoavwBR1K1ybxM/gD1AxW61Gj8Aw9teyioRPwAvjPnhswI/ALBph4+H0z5Ad67E3Mr7PoBZ"
    "Sofcchk/wLkjtzVOET+AdmHQ6GHnPgCm5HJnuAQ/gIyY8bRDLD9QEhWtm5IzP4BDhxs9AP8+"
    "AI5yM5yDHL8AFXN0/asmvwAaI4Be6wK/zB8hATJ5Rb8AZw3K9nQTPwDrbl9baB8/AAmauCOm"
    "HD9gQuj50fYVv8Bf4oGBdDW/gFoqUyj8Kz/wthfYcng0v5i85P10xyK/QO6OQb3tMD/Ak6JD"
    "agogP6COHTlZTDM/sNA5g1zaPL8AHLwFZsQBvwCl7FR8RBK/AMBuXGa1nj4AaAEIq2AWvwCI"
    "iC0CM/W+AKRjgkQMD79gRsK5GJkkPwAD9eQe5Bq/YNpy2BBOFb/geZ6I0Bkcv7CGpa0E6zO/"
    "QGMxv6ukI78A7DUzYCkDPwCD8zdqSiW/gF6/+P7//b5A7dhmuvo3vwD4xKM0Yi2/AOZG1BxY"
    "RL+AYziMeEAvv4CcXJX6Pj+/AJj54m1cG78AAAAAAIjRvEBqANVyu0C/gM4V4sRiJ78AP0YK"
    "wNQpv4Al75CxUTG/gDJpHVLbKL9gkLT8rlwov+DppRCC1S6/YLi6c497L79Q0I3cq+41vwC0"
    "3rDDtR+/oLlOZ6mCFb/4AwpupagSv3i17OGxNx2/ADQuZxqlHL9AtRFrGOQovw=="
)
SYNTH_WINDOW_B64 = (
    "6UV7EcmQ6D4AEIpZdwH1PgDcyHZCIP0+ABiHeffgAD8AEXX6pSICPwBEfQRqwAs/AHirA5G/"
    "CT8A0DIHhVQBPwB0ICMbUwQ/QMVN1cKGAT8Az9/oyH4MPwDiS4od5QA/AADaEYV5/D6A1PGB"
    "i/QBPwBwb71svfQ+AKA7nqzV1T4AAAAAAABwvADQhezCUeW+4OzkHgDM+r6AjPLkLucDvwAX"
    "a0BXAQe/AIvy0Q/MAr8AH82c2JIUvwDYlis7vgy/AA2QQXx/D7+I4uXEeJ4RvwDOxzweGhW/"
    "AJlUPuSqGr+A+Kl8IOIRvwC1dISxohW/AADVzrYJEb8AGKi7t98PvwDoSf4A0Qu/AF5hs9E/"
    "Eb+AYwQK4GAYvwBzOV4U3hq/wOn+v+waI79gJ8CwDbskvwAtR8LyaCm/z0cof1PiKb9IEKSX"
    "6skuvy4YF1NlyCy/ZWsAz4c4Lb/KaCvfBgc0vz7LAdkSjTO/Jlw7arMkNb/aZt/MQrI0vyBt"
    "A3D5XTa/QE1XDRFJNr9wAeBcWvg4v+O8o2IQwjq/LUeP4l/VNr+IfOnlcLg7v5CybGL1eTm/"
    "pkoiESo2NL+EjAsBK4o2v9CbzTgHfTe/GEsUYNnbOL+AM9s4nbI0v3KaZJ/anDO/GwC8VPHn"
    "Mr+weudX/A4xvwC/XYfiTiy/wL/VlU6jKb+Amr8MoUApP4D/xmhjyyo/qM+vGpyQMD/gd72Q"
    "5SgyP1y07C+1VjM/7Deu8vrdMD/YbfJl5To1P5Uv6DMdRjU/fCVL/2LrND+0cvDbZUcyP/ad"
    "+CERrTA/WU2tDIoQLz/ytmAPm8wXPzmpjY8jlCc/IGjvIX46Hz/6v30ncigUP3CoLeOMvrK8"
    "rS07vF3GGL95K+ySQZgfv8sqXFOiKSa/HrxpB61OLr8hSAVakXYxv7ecO03Pojm/GhUAHiaf"
    "O78rpG29rmxAv55MitD+8EG/KAR5WY1ORL95SIBIONdCv2x7CfY/G0S/ttLnNki5RL9Q1Z3t"
    "eBZEv4Bga+TfuUO/UNxToXZCQr84fT+fYMRFv6CvBW2Uzkm/9Ni5Zq2wTL8RwAmzd7dQv3HB"
    "o3NPrFK/WE2yBoNJVb8fCqt/G6VWv5IQzX/8p1i/Om/MgU6wWr/gTv6p4E1cv0CcoBTaQ16/"
    "+NLC6JERYL/mYgHW06Ngv7gpXDt9wGG/9UY0m6zmYb+8HgwvgZ9iv/tlA6vPtGO/fvqUoHeJ"
    "Y79HWPEHFcRjvwspocAl5GO/56b1Evu5ZL/XGm3SdzNkv/WRVp5wHGS/y0uWuQJDZL+RsIaH"
    "EF1jv59KXlengGO/2ObQ49MlY7/Mldgmz0xivxq29uruQmG/RRLoF3x0YL/g7Vercapev3J+"
    "HuMRVlw/yE9nX5VmXj9GMvjgsVtgP5hROTkY7mA/0G5ZdeUTYT/2YKqZ3/hgP8L5JY+tEGE/"
    "1L4dwqL+YD/kFmJYDqtfP36rSx9Z2F0/QKXdH5t/Wz/jQOXGdWtXP/ZJSc4qoFQ/Dx5qhf9V"
    "UD/sDMmbUGxGPwB6+ipiODw/DCC5SaZmrTweo0GmVKM1v4Xhj3WMOES/TRiKWdc0UL++o7An"
    "YkdXvyG3VvXntFy/EiJDL4XkYb8h+J9Mxydlv6phd8SsdWi/RoHCJmRYa7/q/+Ru8sxuv0Zc"
    "CQ7QkXC/Ytqra4LIcb8/4n6Azu9yv3G0ClMm2HO/dP4dGqOadL9aDB/OYTp1v85QZGnycne/"
    "DGnC273Deb/bbk/s10N8vzi6PFKBlX6/S+B4ppd8gL/BH8BN4qeBvwCe3sNb74K/rksFB3IZ"
    "hL/hMkqTQEaFv7+bwQUxiIa/RZwh06CSh7+Sk4SCdbyIvwKBYGuB2Im/rgHi7Cuzir+5gTWX"
    "3qaLv3XHPHD3h4y/jyuEPcdZjb/DXF1rp/KNv4bJsbC9t46/BrcH0Ssvj7/Gh9szr7GPv8Sf"
    "nlbn9Y+/ojy07WMwkL/8znzgVz+Qv1pCtzIxU5C/TxpvYR1KkL9pqxneYFOQvxvgi1XfNpC/"
    "GbF5I/4WkL9s8sQ2N8qPv+r2GGjQWI+/83PsZ3nOjj/ouiTLYS2PP4YBOri6XY8/qHQ9CQI3"
    "jz8TGTLRJM2OPwXxGqsdM44/d+mtS6QfjT+lGQZJN/yLP2Ql1vWtcIo/ayTMuzi0iD/SJ6T4"
    "8oiGP8LfCj1tQIQ/ieH72L7HgT+RUuLuHq19P9oHxR5pCXc/VI57y8WycD+A2TgdMHeqPPJF"
    "UxCFLzo/LgPQOgp+WL9V9mMBUIltv2fZkIKEi3e/vMyoPQI8gL+kdRketRaFv+4uT15jEoq/"
    "JiRYol/2jr/OS8wlOQ+Sv97cWW/frZS/V0XYdApbl79QaQ1HWwaav3LWP66zv5y/4lkMRKp5"
    "n79YiGGiNR+hvx3iRxOjeqK/pECxcfS5o7/8D2RQr/+kvxIFmFS6Taa/rckvvFGip7/1xuVo"
    "FfuovzjPQExyVaq/RIYy0qKwq79r4l2cnRCtvxhG3RdJYa6/ZtuNwtO4r79Z0PbkOoCwvzaS"
    "RTVQJLG/W7VEfqzCsb+yrdCUbF2yv9hSoiPD8rK/4JLS6faAs78MQHknPgC0v4kmvWothbS/"
    "GBpfFcv5tL+9sDtkFmO1v+7CDSrOybW/deHuAm4ktr/PzV5b4Xe2vzHyIhkHwra/wdgAE2z7"
    "tr8ryKAkCS23v166ay/KVLe/oCeAaWhyt79EUql6lYW3vza6Lpisire/XqUJJqOIt78eVmuT"
    "BXq3PzJlRIi/hLc/6Ic+RfiDtz9W/WCWrXe3Pwu+ydw6ZLc/hPq8bqFEtz+00G63OBi3PwhQ"
    "ZDWc4rY/Lh4qBi2jtj8/P8+M1Fa2P7Lc/pcwBLY/fNOQr8KmtT+fkke7OUS1P2Qd+lA+0bQ/"
    "lBGjt15UtD+EJFc+t9mzP5CYV/riEaQ8HxRDb5i+sj9dZrnVyiWyP00FWupKkrE/9IihZlXx"
    "sD8XHBB7ak+wP2xF9RNqSK8/Aju6rZ/6rT++6CqJM5+sP+COeilTS6s/l8WzwdztqT9aU260"
    "9ZWoP+tKjF2rO6c/kANomabtpT9cOAls5ZykPwyJjI04WKM/uYPHEzYfoj+MeiFBSsigP46/"
    "BzY4254/HH5jK/kpnD94hDaN5nyZP1gMXueM0pY/8vXPZB45lD+hvm7orKORP+WDg4VwPI4/"
    "v2X4DzJMiT99EjG+bZSEP5rt3ouB3n8/bDbrwdb5dj+sHuRbSSJsPwaKXch00lc/r873aRFi"
    "O7/UuyLN/oBiv2u5T1Mztm+//I4neaSPdr9qE8GanHJ8v0soxtEXBoG/ygDVA8+Jg7+GisyR"
    "IreFvxwFXM04voe/hEjC+8mDib8Be/ftwQSLvwbIvrLSM4y/8Du9N2sPjb/8+NNw67eNv5qB"
    "lmkTFY6/NK7/8D8ujr+/dNh46guOv5lMNu56pI0/ORgtm2EHjj/tVlTD04COPzhuioO10Y4/"
    "mnvlRFwAjz8A7mIL0TCPPy5aNc9vUY8/NDoTITE+jz+VZD2HvgqPPzo0S4sH7o4/B7aQD4Km"
    "jj8yjx1BQCKOPxCzwtuc4o0/QC2mFUQkjT++8U0hlKuMPyFYF6FV34s/oMx2OwhnvDzsqwcg"
    "VUuKP9v83tLvTYk/0IRsSGF0iD9hXRqOUHqHP4pa3K0aeoY/MzJIgKpPhT8zGvln5FGEP6b5"
    "oBpPLIM/uVlug3vtgT+ww1OhytyAPzXPflSaXH8/4+tobODffD/XmyDUQXx6PwjeB9P7Tng/"
    "bgp94AwZdj/8Tn0FVfRzP54qjGNLmHM/8HjW8MzRcj/wOGQuIOxxP8aCobmG4XA/SKgPLMWD"
    "bz8wrvtFdsdsPwhMj0fo2Wk/gP5kKAJ7Zj+FfMyQNgFkP2w9v1Skg2A/kNw/l1W9Wz9csxQt"
    "6HxVP0QzZX3aXE4/Xz6T0HHCQz9+k6XEb+0wPwCfGo6s7CC/+iEGaVG/Nr+NN5jtErtEv/xP"
    "cItm2E+/+kiS8YBeU793BPGN9rFVv0DZZ/1i1Vi/lkzr5oMjXL+fop7GZKpevxLm9Fw5Dl+/"
    "hGnewoyaX786XZz2N1Vgv60Q2HDTAGC/2CBEyGNqX7+EhiSMgxFev7Jh4d9Ndly/hDw5fRE3"
    "Wj+KzdkWHttcP1Vb2+kpKl4/CJIQ9/8mYD+w9u5KPo1gP/obOmdoc2E//DHwWbIrYj9MTa7q"
    "PlxiP7Ct8gB2fmI/f52ZAQ76Yj9DPLOPCgxjPxOUsochBmM/unbKT0aKYz81L6h7w3xiP694"
    "8Puer2I/MI3cmlKuYT9AIvV6zeahvFSluJorIWE/7L6Ii2fhXz+8HhT9HPpeP6MgQ2NqRF0/"
    "mYJ0psU9XD+dWMhlq1xaP3jBQsgtVFg/NVRhVFS8Vj9JjOv07pBUP1Rm7ubLF1M/0w3mRZxn"
    "UT/ExPwFCY5OP64VHTwGbks/+FMdRYxIRj+goGZ36nBEP3A9j0WiPkA/uMypC9zIQD8onFj1"
    "hRdCP9DDoive6kE/Yg5jv33xQT/mgreBDtZBP0BqSda4rj0/QJA9Ip5LPz/gOfMZ6mE9PwA7"
    "kBZWBzw/KgSXTrOKNT+XEAM1AEwqPxg0zWfHwy8/wcsQj1ytID8TXmBo7m0GP+qNkolphQI/"
    "AApl81XZ8T7/MVsIsOTYvkLTIWnkrSW/cGWAC/twJr8P5hcLFXApv3L7rY0tEyy/qmmaOGFO"
    "ML9mjaXlclYpv5Xqzpl2My6/VF+z43yVLb8AiK42F14yv3vLf8lkJjK/C6ub0lQRML+gXiVX"
    "d/otv/Ak6T0vviu/wJ+uiR20JL8ItekKgSUjPwA35f2SjCc/IPHdUzf+LD+oPWOugr0sP0Ai"
    "YJ5hmC4/WI4A+JnoMj8YLJxHa4Q1P9ZbqBNC4TA/eFzHxD38ND+FY5sr5dwyP7ayQSLQRzg/"
    "Hxh42sA9Nj/ubixUixw7P4D6cQyvnzY/XvjYNXYdNT+AdDzurZQ2PzAhRWfljMW8u0Zw12id"
    "Nj9CT4y2TbI3P2hwWZjfri8/g+jg6WMIOT98qhJ3QTwtP2ELL+apgi8/ViBQe+J4KT+sTF0c"
    "I6IqP2GAXU433Ck/kKZn/7PgHD8ER7ojdcAiPxYJxjDAchg/8K012++hGT+AC+WRmMQTP4Dt"
    "PQqyfRA/AApKdDQdAD+AZxMebhoVPwC4aHaUwA8/AJoD601lDD+AITuzJ/IJP4DmE5nAMAQ/"
    "ALywMHfgED/MppqShQ0UP8A1+nCX4ww/IPctRh+bDT/IPbnxM9/9PqhHG0AtXPk+AOC2OoUF"
    "wT7IacE+kO3uPshx90bOvO2+42fRBP7DAj8A0NWxLaPBPlDRRvD1MAK/uthEtxKxwj4Jk3E3"
    "WXnwvs0jaEe3p8m+PNAZq5FQ9r6dNTlyFdHxviPTGrzVRAO/BDkP4rPHAL/gzqpQnnoLvwCe"
    "T/WqMfW+aPehy6jf8b4gAJzeQyz0vgBBrKls/fe+gD9Ws8Wx9b4ALxdYt6D/vg=="
)

_ISO_WINDOWS: tuple[np.ndarray, np.ndarray] | None = None
_WINDOW_EPOCH = 0  # bumped on every (un)swap; rebuilds the facade


def set_iso_windows(analysis: "np.ndarray | None", synth: np.ndarray) -> None:
    """Swap in the ISO 11172-3 Table 3-C.1 (analysis C) / 3-B.3
    (synthesis D) coefficients for bit-conformant real-file decode.
    ``analysis`` may be None when only decoding.  Affects the
    module-level :data:`decode_mp3_samples` immediately (it rebuilds
    on the next call) and every decoder FACTORY invocation after this
    call — Spark stages built afterwards (``decode_samples``) capture
    the swapped window by value and ship it to executors."""
    global _ISO_WINDOWS, _WINDOW_EPOCH
    a = (
        np.asarray(analysis, dtype=np.float64)
        if analysis is not None
        else _default_windows()[0]
    )
    d = np.asarray(synth, dtype=np.float64)
    if a.shape != (512,) or d.shape != (512,):
        raise ValueError("windows must be 512-tap")
    _ISO_WINDOWS = (a, d)
    _WINDOW_EPOCH += 1


def clear_iso_windows() -> None:
    """Revert to the designed substitute window pair."""
    global _ISO_WINDOWS, _WINDOW_EPOCH
    _ISO_WINDOWS = None
    _WINDOW_EPOCH += 1


#: injectable ISO 11172-3 Annex-B Layer III table data (same policy as
#: the window: the DECODE MACHINERY — Huffman walk, linbits escapes,
#: sign bits, count1 quads, scalefactor-band partitioning, preflag,
#: requantization, reorder, m/s — is fully implemented and round-trip
#: verified with self-consistent tables; the published NUMERIC values
#: are not transcribed from memory).  Shape:
#:   huffman:  {table_id: ({(code_len, code): (x, y)}, linbits)}
#:   count1:   {0/1: {(code_len, code): (v, w, x, y)}}
#:   sfb_long: {sample_rate: [23 ascending boundaries, 0..576]}
#:   sfb_short:{sample_rate: [14 ascending boundaries, 0..192]}
#:   pretab:   [22 ints] (preflag additions per long band)
_L3_TABLES: "dict | None" = None


def set_l3_tables(huffman: dict, count1: dict, sfb_long: dict,
                  sfb_short: dict, pretab) -> None:
    """Install Layer III Huffman/scalefactor-band tables, enabling
    nonzero-spectrum decode.  Affects :data:`decode_mp3_samples`
    immediately and decoder factories invoked afterwards (Spark stages
    capture the tables by value at build time)."""
    global _L3_TABLES, _WINDOW_EPOCH
    for rate, b in sfb_long.items():
        if len(b) != 23 or b[0] != 0 or b[-1] != 576 or \
                sorted(b) != list(b):
            raise ValueError(f"bad long sfb boundaries for {rate}")
    for rate, b in sfb_short.items():
        if len(b) != 14 or b[0] != 0 or b[-1] != 192 or \
                sorted(b) != list(b):
            raise ValueError(f"bad short sfb boundaries for {rate}")
    if len(pretab) != 22:
        raise ValueError("pretab must have 22 entries")
    _L3_TABLES = {
        "huffman": {int(k): (dict(v[0]), int(v[1]))
                    for k, v in huffman.items()},
        "count1": {int(k): dict(v) for k, v in count1.items()},
        "sfb_long": {int(k): list(v) for k, v in sfb_long.items()},
        "sfb_short": {int(k): list(v) for k, v in sfb_short.items()},
        "pretab": list(pretab),
    }
    _WINDOW_EPOCH += 1


def clear_l3_tables() -> None:
    """Remove the injected Layer III tables (nonzero spectra gate
    again; zero-spectrum/silence decode never needs them)."""
    global _L3_TABLES, _WINDOW_EPOCH
    _L3_TABLES = None
    _WINDOW_EPOCH += 1


def _default_windows() -> tuple[np.ndarray, np.ndarray]:
    c = np.frombuffer(base64.b64decode(ANALYSIS_WINDOW_B64), dtype="<f8")
    d = np.frombuffer(base64.b64decode(SYNTH_WINDOW_B64), dtype="<f8")
    return c.copy(), d.copy()


def _active_windows() -> tuple[np.ndarray, np.ndarray]:
    return _ISO_WINDOWS if _ISO_WINDOWS is not None else _default_windows()


# ----------------------------------------------------------------- #
# decoder factory
# ----------------------------------------------------------------- #


def _make_mp3_sample_decoder() -> Callable[[bytes], "dict | None"]:
    """Build the MPEG-1 audio sample decoder (see module docstring).
    Returns stats dicts in multimodal.SAMPLES_SCHEMA shape."""
    synth_window = _active_windows()[1]
    l3_tables = _L3_TABLES  # captured by value at build time

    BITRATES = {
        1: (None, 32, 64, 96, 128, 160, 192, 224,
            256, 288, 320, 352, 384, 416, 448),
        2: (None, 32, 48, 56, 64, 80, 96, 112,
            128, 160, 192, 224, 256, 320, 384),
        3: (None, 32, 40, 48, 56, 64, 80, 96,
            112, 128, 160, 192, 224, 256, 320),
    }
    RATES = (44100, 48000, 32000)
    # Layer I/II multiplier table: SF[i] = 2 * 2^(-i/3), indices 0..62
    SCALEFACTORS = tuple(2.0 * 2.0 ** (-i / 3.0) for i in range(63))

    # Layer II quantization-step rows (ISO Table 3-B.2 columns) and the
    # four allocation tables.  The C/D requant constants are DERIVED
    # from the step count (see _l2_requant), not transcribed.
    ROW_A0 = (0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047,
              4095, 8191, 16383, 32767, 65535)
    ROW_A1 = (0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023,
              2047, 4095, 8191, 65535)
    ROW_A2 = (0, 3, 5, 7, 9, 15, 31, 65535)
    ROW_A3 = (0, 3, 5, 65535)
    ROW_C = (0, 3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
             4095, 8191, 16383, 32767)
    TABLE_A = tuple(
        ROW_A0 if sb < 3 else ROW_A1 if sb < 11 else
        ROW_A2 if sb < 23 else ROW_A3
        for sb in range(27)
    )
    TABLE_B = tuple(
        ROW_A0 if sb < 3 else ROW_A1 if sb < 11 else
        ROW_A2 if sb < 23 else ROW_A3
        for sb in range(30)
    )
    TABLE_C = tuple(ROW_C for _ in range(8))
    TABLE_D = tuple(ROW_C for _ in range(12))
    GROUP_BITS = {3: 5, 5: 7, 9: 10}  # triplet-coded classes

    # Layer III scalefac_compress -> (slen1, slen2)
    SLEN = ((0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2),
            (1, 3), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3),
            (4, 2), (4, 3))
    # alias-reduction butterflies: ci published in ISO 2.4.3.4.10.1
    CI = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
    CS = tuple(1.0 / (1.0 + c * c) ** 0.5 for c in CI)
    CA = tuple(c / (1.0 + c * c) ** 0.5 for c in CI)
    CS_V = np.array(CS)
    CA_V = np.array(CA)

    N_SYN = np.array(
        [[np.cos((16 + i) * (2 * k + 1) * np.pi / 64) for k in range(32)]
         for i in range(64)]
    )
    # IMDCT kernels (analytic): long 36<-18, short 12<-6
    IMDCT36 = np.array(
        [[np.cos(np.pi / 72 * (2 * i + 1 + 18) * (2 * k + 1))
          for k in range(18)] for i in range(36)]
    )
    IMDCT12 = np.array(
        [[np.cos(np.pi / 24 * (2 * i + 1 + 6) * (2 * k + 1))
          for k in range(6)] for i in range(12)]
    )
    WIN_LONG = np.sin(np.pi / 36 * (np.arange(36) + 0.5))
    WIN_SHORT = np.sin(np.pi / 12 * (np.arange(12) + 0.5))
    WIN_START = np.concatenate([
        np.sin(np.pi / 36 * (np.arange(18) + 0.5)),
        np.ones(6),
        np.sin(np.pi / 12 * (np.arange(18, 24) - 18 + 0.5 + 6)),
        np.zeros(6),
    ])
    WIN_STOP = np.concatenate([
        np.zeros(6),
        np.sin(np.pi / 12 * (np.arange(6) + 0.5)),
        np.ones(6),
        np.sin(np.pi / 36 * (np.arange(18, 36) + 0.5)),
    ])

    def mpeg_crc16(hdr_tail: bytes, body: bytes, nbits: int) -> int:
        """ISO 11172-3 CRC-16 (poly 0x8005, init 0xFFFF, MSB-first)
        over the last two header bytes plus the first ``nbits``
        protected bits of the frame body."""
        c = 0xFFFF

        def feed(bit: int) -> None:
            nonlocal c
            hi = (c >> 15) & 1
            c = (c << 1) & 0xFFFF
            if hi ^ bit:
                c ^= 0x8005

        for byte in hdr_tail:
            for k in range(7, -1, -1):
                feed((byte >> k) & 1)
        for i in range(nbits):
            feed((body[i >> 3] >> (7 - (i & 7))) & 1)
        return c

    class _Bits:
        """Absolute-bit-position reader: one ``int.from_bytes`` over
        the covering byte span per field instead of a per-bit loop
        (the per-field reader was the top cost of a Layer II decode —
        same shape as the FLAC reader in operators/multimodal.py)."""

        __slots__ = ("data", "pos", "nbits")

        def __init__(self, data: bytes, pos: int = 0):
            self.data = data
            self.pos = pos  # bit position
            self.nbits = len(data) * 8

        def read(self, n: int) -> int:
            p = self.pos
            end = p + n
            if end > self.nbits:
                raise EOFError
            chunk = int.from_bytes(
                self.data[p >> 3:(end + 7) >> 3], "big")
            self.pos = end
            return (chunk >> ((-end) & 7)) & ((1 << n) - 1)

    def parse_header(p: bytes, off: int) -> "dict | None":
        if off + 4 > len(p):
            return None
        b0, b1, b2, b3 = p[off:off + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            return None
        if (b1 >> 3) & 3 != 3:
            return None  # MPEG-2/2.5: out of scope (documented)
        layer = {3: 1, 2: 2, 1: 3}.get((b1 >> 1) & 3)
        if layer is None:
            return None
        crc = not (b1 & 1)  # protection_bit 0 -> CRC-16 present
        bidx, ridx = b2 >> 4, (b2 >> 2) & 3
        if bidx in (0, 15) or ridx == 3:
            return None  # free-format / reserved: gated
        bitrate = BITRATES[layer][bidx] * 1000
        rate = RATES[ridx]
        pad = (b2 >> 1) & 1
        mode, mode_ext = b3 >> 6, (b3 >> 4) & 3
        if layer == 1:
            flen = (12 * bitrate // rate + pad) * 4
        else:
            flen = 144 * bitrate // rate + pad
        return {
            "layer": layer, "crc": crc, "bitrate": bitrate, "rate": rate,
            "mode": mode, "mode_ext": mode_ext, "frame_len": flen,
            "nch": 1 if mode == 3 else 2,
        }

    def requant(code: int, nb: int) -> float:
        """Layer I / power-of-two Layer II classes: MSB-inverted two's
        complement then s''' = 2^nb/(2^nb-1) * (s'' + 2^(1-nb))."""
        u = code ^ (1 << (nb - 1))
        if u >= 1 << (nb - 1):
            u -= 1 << nb
        frac = u / float(1 << (nb - 1))
        return (float(1 << nb) / ((1 << nb) - 1)) * (frac + 2.0 ** (1 - nb))

    _L2_CONST: dict = {}  # steps -> (half, full, C, D, 1/half), memoized

    def l2_requant(code: int, steps: int) -> float:
        """Layer II class requantization s''' = C*(s''+D), constants
        derived: C = 2^nb/steps, D = (2^(nb-1)-(steps-1)/2)/2^(nb-1)
        (memoized per step class — this runs once per decoded sample)."""
        t = _L2_CONST.get(steps)
        if t is None:
            nb = steps.bit_length()
            half, full = 1 << (nb - 1), 1 << nb
            t = _L2_CONST[steps] = (
                half, full, float(full) / steps,
                (float(half) - (steps - 1) // 2) / float(half),
                1.0 / half,
            )
        half, full, c, d, inv = t
        u = code ^ half
        if u >= half:
            u -= full
        return c * (u * inv + d)

    # ------------------------------------------------------------- #
    # Layer I
    # ------------------------------------------------------------- #

    def layer1_subbands(bits: _Bits, hdr: dict, crc=None) -> np.ndarray:
        nch = hdr["nch"]
        bound = (hdr["mode_ext"] + 1) * 4 if hdr["mode"] == 1 else 32
        alloc = [[0] * 32 for _ in range(nch)]
        for sb in range(bound):
            for ch in range(nch):
                a = bits.read(4)
                if a == 15:
                    raise ValueError("forbidden allocation")
                alloc[ch][sb] = a
        for sb in range(bound, 32):
            a = bits.read(4)
            if a == 15:
                raise ValueError("forbidden allocation")
            for ch in range(nch):
                alloc[ch][sb] = a
        if crc is not None:
            # Layer I protects the allocation bits (2.4.3.1)
            want, hdr_tail = crc
            if mpeg_crc16(hdr_tail, bits.data, bits.pos) != want:
                raise ValueError("CRC mismatch")
        scf = [[0] * 32 for _ in range(nch)]
        for sb in range(32):
            for ch in range(nch):
                if alloc[ch][sb]:
                    s = bits.read(6)
                    if s == 63:
                        raise ValueError("reserved scalefactor")
                    scf[ch][sb] = s
        out = np.zeros((12, nch, 32))
        for s in range(12):
            for sb in range(32):
                if sb < bound:
                    for ch in range(nch):
                        if alloc[ch][sb]:
                            nb = alloc[ch][sb] + 1
                            code = bits.read(nb)
                            out[s, ch, sb] = (
                                requant(code, nb) * SCALEFACTORS[scf[ch][sb]]
                            )
                else:
                    if alloc[0][sb]:
                        nb = alloc[0][sb] + 1
                        code = bits.read(nb)
                        v = requant(code, nb)
                        for ch in range(nch):
                            out[s, ch, sb] = v * SCALEFACTORS[scf[ch][sb]]
        return out

    # ------------------------------------------------------------- #
    # Layer II
    # ------------------------------------------------------------- #

    def l2_table(hdr: dict):
        """Allocation-table select per (rate, bitrate/channel).  The
        MAPPING follows the public dist10 structure; like every numeric
        ISO table here it is best-effort-transcribed and exercised by
        this repo's own encoder round-trips."""
        bpc = hdr["bitrate"] // hdr["nch"]
        if bpc <= 48000:
            return TABLE_D if hdr["rate"] == 32000 else TABLE_C
        if bpc <= 80000 or hdr["rate"] == 48000:
            return TABLE_A
        return TABLE_B

    def layer2_subbands(bits: _Bits, hdr: dict, crc=None) -> np.ndarray:
        nch = hdr["nch"]
        table = l2_table(hdr)
        sblimit = len(table)
        bound = min((hdr["mode_ext"] + 1) * 4, sblimit) \
            if hdr["mode"] == 1 else sblimit
        alloc = [[0] * sblimit for _ in range(nch)]
        for sb in range(bound):
            nbal = (len(table[sb]) - 1).bit_length()
            for ch in range(nch):
                alloc[ch][sb] = bits.read(nbal)
        for sb in range(bound, sblimit):
            nbal = (len(table[sb]) - 1).bit_length()
            a = bits.read(nbal)
            for ch in range(nch):
                alloc[ch][sb] = a
        scfsi = [[0] * sblimit for _ in range(nch)]
        for sb in range(sblimit):
            for ch in range(nch):
                if alloc[ch][sb]:
                    scfsi[ch][sb] = bits.read(2)
        if crc is not None:
            # Layer II protects allocation + scfsi bits (2.4.3.1)
            want, hdr_tail = crc
            if mpeg_crc16(hdr_tail, bits.data, bits.pos) != want:
                raise ValueError("CRC mismatch")
        scf = [[(0, 0, 0)] * sblimit for _ in range(nch)]
        for sb in range(sblimit):
            for ch in range(nch):
                if not alloc[ch][sb]:
                    continue
                si = scfsi[ch][sb]
                if si == 0:
                    f = (bits.read(6), bits.read(6), bits.read(6))
                elif si == 1:
                    a, b = bits.read(6), bits.read(6)
                    f = (a, a, b)
                elif si == 2:
                    a = bits.read(6)
                    f = (a, a, a)
                else:
                    a, b = bits.read(6), bits.read(6)
                    f = (a, b, b)
                if any(x == 63 for x in f):
                    raise ValueError("reserved scalefactor")
                scf[ch][sb] = f
        out = np.zeros((36, nch, 32))

        def read_triplet(steps: int) -> "tuple[float, float, float]":
            if steps in GROUP_BITS:
                c = bits.read(GROUP_BITS[steps])
                if c >= steps ** 3:
                    raise ValueError("grouped code out of range")
                s0 = l2_requant(c % steps, steps)
                c //= steps
                s1 = l2_requant(c % steps, steps)
                s2 = l2_requant(c // steps, steps)
                return s0, s1, s2
            nb = steps.bit_length()
            return (l2_requant(bits.read(nb), steps),
                    l2_requant(bits.read(nb), steps),
                    l2_requant(bits.read(nb), steps))

        for gr in range(12):
            part = gr >> 2
            for sb in range(sblimit):
                if sb < bound:
                    for ch in range(nch):
                        if alloc[ch][sb]:
                            steps = table[sb][alloc[ch][sb]]
                            tri = read_triplet(steps)
                            f = SCALEFACTORS[scf[ch][sb][part]]
                            for j in range(3):
                                out[3 * gr + j, ch, sb] = tri[j] * f
                else:
                    if alloc[0][sb]:
                        steps = table[sb][alloc[0][sb]]
                        tri = read_triplet(steps)
                        for ch in range(nch):
                            f = SCALEFACTORS[scf[ch][sb][part]]
                            for j in range(3):
                                out[3 * gr + j, ch, sb] = tri[j] * f
        return out

    # ------------------------------------------------------------- #
    # Layer III (zero-spectrum subset; see module docstring gate 1)
    # ------------------------------------------------------------- #

    def l3_side_info(bits: _Bits, nch: int):
        info = {"main_data_begin": bits.read(9)}
        bits.read(5 if nch == 1 else 3)  # private bits
        scfsi = [[bits.read(1) for _ in range(4)] for _ in range(nch)]
        info["scfsi"] = scfsi
        grs = []
        for _gr in range(2):
            chs = []
            for _ch in range(nch):
                g = {
                    "part2_3_length": bits.read(12),
                    "big_values": bits.read(9),
                    "global_gain": bits.read(8),
                    "scalefac_compress": bits.read(4),
                }
                wsf = bits.read(1)
                g["window_switching"] = wsf
                if wsf:
                    g["block_type"] = bits.read(2)
                    g["mixed_block"] = bits.read(1)
                    g["table_select"] = (bits.read(5), bits.read(5))
                    g["subblock_gain"] = (
                        bits.read(3), bits.read(3), bits.read(3))
                    if g["block_type"] == 0:
                        raise ValueError("reserved block_type")
                else:
                    g["block_type"] = 0
                    g["mixed_block"] = 0
                    g["table_select"] = (
                        bits.read(5), bits.read(5), bits.read(5))
                    g["region0_count"] = bits.read(4)
                    g["region1_count"] = bits.read(3)
                g["preflag"] = bits.read(1)
                g["scalefac_scale"] = bits.read(1)
                g["count1table_select"] = bits.read(1)
                chs.append(g)
            grs.append(chs)
        info["granules"] = grs
        return info

    def l3_scalefactors(g: dict, gr: int, scfsi_ch, read, gr0_store):
        """Read AND store the scalefactors.  Returns
        (scf_long[22], scf_short[12][3] or None).  ``gr0_store`` holds
        granule 0's long values for scfsi band-group reuse."""
        slen1, slen2 = SLEN[g["scalefac_compress"]]
        if g["window_switching"] and g["block_type"] == 2:
            if gr == 1 and any(scfsi_ch):
                raise ValueError("scfsi set for a short-block granule")
            scf_s = [[0] * 3 for _ in range(13)]
            if g["mixed_block"]:
                scf_l = [0] * 22
                for sfb in range(8):
                    scf_l[sfb] = read(slen1)
                for sfb in range(3, 6):
                    for win in range(3):
                        scf_s[sfb][win] = read(slen1)
                for sfb in range(6, 12):
                    for win in range(3):
                        scf_s[sfb][win] = read(slen2)
                return scf_l, scf_s
            for sfb in range(0, 6):
                for win in range(3):
                    scf_s[sfb][win] = read(slen1)
            for sfb in range(6, 12):
                for win in range(3):
                    scf_s[sfb][win] = read(slen2)
            return [0] * 22, scf_s
        # long blocks: bands 0-10 slen1, 11-20 slen2 (sfb 21 has no
        # scalefactor), scfsi groups (0-5, 6-10, 11-15, 16-20) shared
        # into granule 1 when set
        scf_l = [0] * 22
        groups = [(range(0, 6), slen1), (range(6, 11), slen1),
                  (range(11, 16), slen2), (range(16, 21), slen2)]
        for gi, (band_range, slen) in enumerate(groups):
            if gr == 1 and scfsi_ch[gi]:
                for sfb in band_range:
                    scf_l[sfb] = gr0_store[sfb]
                continue  # reused: no bits in granule 1
            for sfb in band_range:
                scf_l[sfb] = read(slen)
        return scf_l, None

    def l3_huff_lookup(mbits: _Bits, codes: dict, maxlen: int):
        code = 0
        for ln in range(1, maxlen + 1):
            code = (code << 1) | mbits.read(1)
            v = codes.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid L3 Huffman code")

    # Two-level decode tables built ONCE at factory time (the JPEG DHT
    # / Vorbis codebook structure, round-11 PERF discipline): an 8-bit
    # first-level LUT resolves every code of length <= 8 in one peek
    # (real Annex-B tables put the frequent small pairs there), a
    # (length, code) dict handles the tail, and the per-granule
    # ``maxlens`` dict-comprehension the old reader rebuilt is hoisted
    # here.  Entries whose canonical code exceeds 2^len (malformed
    # injected tables) stay reachable only via the dict — exactly the
    # codes the per-bit walk could resolve.  Tables whose max code
    # length exceeds the 56-bit peek window fall back to the original
    # per-bit reader (``None`` marker), keeping arbitrary injected
    # tables functional.
    _l3_big_dec: "dict | None" = None
    _l3_c1_dec: "dict | None" = None
    if l3_tables is not None:
        _l3_big_dec = {}
        for _tid, (_codes, _lb) in l3_tables["huffman"].items():
            _maxlen = max(ln for ln, _c in _codes)
            if _maxlen > 56 or _lb > 25:
                _l3_big_dec[_tid] = None  # per-bit fallback
                continue
            _lut = [None] * 256
            for (_ln, _code), _xy in _codes.items():
                if _ln <= 8 and _code < (1 << _ln):
                    _base = _code << (8 - _ln)
                    for _i in range(_base, _base + (1 << (8 - _ln))):
                        _lut[_i] = (_ln, _xy[0], _xy[1])
            _l3_big_dec[_tid] = (_lut, _codes, _maxlen, _lb)
        _l3_c1_dec = {}
        for _tid, _codes in l3_tables["count1"].items():
            _maxlen = max(ln for ln, _c in _codes)
            if _maxlen > 56:
                _l3_c1_dec[_tid] = None
                continue
            _lut = [None] * 256
            for (_ln, _code), _q in _codes.items():
                if _ln <= 8 and _code < (1 << _ln):
                    _base = _code << (8 - _ln)
                    for _i in range(_base, _base + (1 << (8 - _ln))):
                        _lut[_i] = (_ln,) + tuple(_q)
            _l3_c1_dec[_tid] = (_lut, _codes, _maxlen)

    def l3_huffman_spectrum(mbits: _Bits, g: dict, limit_bit: int,
                            bl) -> "np.ndarray":
        """big_values pairs (region-selected tables, linbits escapes,
        sign bits) + count1 quads up to part2_3_length -> (integer
        spectrum (576), end line) — the end line (first line past the
        coded region) is the intensity-stereo zero-part boundary.

        Hot path: a bit cache (masked to its live width at every
        refill — no stale-bit accumulation, the round-11 TIFF-LZW
        lesson) refilled in 32-bit gulps
        from the zero-padded buffer (the FLAC reader shape), the
        first-level LUT above, and a plain list for the spectrum.
        Reads past the real data are zero bits that can only ever
        LOWER the final position check — any walk that consumed a
        padded bit ends with ``pos > nbits`` and raises the same
        EOFError the per-field reader raised mid-walk, so accepted
        streams are bit-identical to the old reader and rejected
        streams stay rejected."""
        is_ = [0] * 576
        nbig = g["big_values"] * 2
        if nbig > 576:
            raise ValueError("big_values overrun")
        if g["window_switching"]:
            r0_end, r1_end = 36, 576
        else:
            r0 = min(g["region0_count"] + 1, 22)
            r1 = min(g["region0_count"] + 1 + g["region1_count"] + 1, 22)
            r0_end, r1_end = bl[r0], bl[r1]
        huff = l3_tables["huffman"]
        ts = g["table_select"]
        nts = len(ts)

        # bit cache over the padded buffer: pos tracks the CONSUMED
        # absolute bit position, cache holds the next <=64 unread bits
        # in its low cbits bits (stale higher bits masked at refill)
        data = mbits.data
        nbits = mbits.nbits
        buf = data + b"\x00" * 12
        pos = mbits.pos
        cbyte = (pos + 7) >> 3
        cbits = cbyte * 8 - pos
        cache = (int.from_bytes(buf[pos >> 3:cbyte], "big")
                 & ((1 << cbits) - 1)) if cbits else 0
        from_bytes = int.from_bytes

        # big-values region segments: (end_pair, table_id), pairs in
        # [start, end) decode with one table — same region selection
        # as the per-pair branch, hoisted out of the loop
        segs = []
        for seg_end, seg_region in ((min(nbig, r0_end), 0),
                                    (min(nbig, r1_end), 1),
                                    (nbig, 2)):
            segs.append((seg_end, ts[seg_region] if seg_region < nts
                         else 0))
        p = 0
        for seg_end, tid in segs:
            if p >= seg_end:
                continue
            if tid == 0:
                # table 0: all zeros, no bits — one limit check for
                # the segment (the old reader checked per pair with
                # an unchanged pos)
                if pos > limit_bit:
                    raise ValueError("big_values overrun part2_3_length")
                p = seg_end
                continue
            if tid not in huff:
                raise ValueError(f"L3 Huffman table {tid} not provided")
            dec = _l3_big_dec[tid]
            if dec is None:
                # oversized injected table: per-bit fallback
                mbits.pos = pos
                codes, linbits = huff[tid]
                maxlen = max(ln for ln, _c in codes)
                while p < seg_end:
                    if mbits.pos > limit_bit:
                        raise ValueError(
                            "big_values overrun part2_3_length")
                    x, y = l3_huff_lookup(mbits, codes, maxlen)
                    for j, v in enumerate((x, y)):
                        if v == 15 and linbits:
                            v += mbits.read(linbits)
                        if v:
                            if mbits.read(1):
                                v = -v
                            is_[p + j] = v
                    p += 2
                pos = mbits.pos
                cbyte = (pos + 7) >> 3
                cbits = cbyte * 8 - pos
                cache = (from_bytes(buf[pos >> 3:cbyte], "big")
                         & ((1 << cbits) - 1)) if cbits else 0
                continue
            lut, codes, maxlen, linbits = dec
            # worst case bits per pair: code + 2*(linbits + sign)
            need = maxlen + 2 * (linbits + 1)
            while p < seg_end:
                if pos > limit_bit:
                    raise ValueError("big_values overrun part2_3_length")
                while cbits < need:
                    cbits += 32
                    cache = ((cache << 32)
                             | from_bytes(buf[cbyte:cbyte + 4], "big")) \
                        & ((1 << cbits) - 1)
                    cbyte += 4
                e = lut[(cache >> (cbits - 8)) & 0xFF]
                if e is not None:
                    ln, x, y = e
                    cbits -= ln
                    pos += ln
                else:
                    peek = (cache >> (cbits - maxlen)) \
                        & ((1 << maxlen) - 1)
                    for ln in range(9, maxlen + 1):
                        xy = codes.get((ln, peek >> (maxlen - ln)))
                        if xy is not None:
                            x, y = xy
                            cbits -= ln
                            pos += ln
                            break
                    else:
                        raise ValueError("invalid L3 Huffman code")
                if x:
                    if x == 15 and linbits:
                        x += (cache >> (cbits - linbits)) \
                            & ((1 << linbits) - 1)
                        cbits -= linbits
                        pos += linbits
                    if (cache >> (cbits - 1)) & 1:
                        x = -x
                    cbits -= 1
                    pos += 1
                    is_[p] = x
                if y:
                    if y == 15 and linbits:
                        y += (cache >> (cbits - linbits)) \
                            & ((1 << linbits) - 1)
                        cbits -= linbits
                        pos += linbits
                    if (cache >> (cbits - 1)) & 1:
                        y = -y
                    cbits -= 1
                    pos += 1
                    is_[p + 1] = y
                p += 2
        c1 = l3_tables["count1"]
        tid = g["count1table_select"]
        if tid not in c1:
            mbits.pos = pos
            if pos > nbits:
                raise EOFError
            if pos < limit_bit:
                raise ValueError(f"L3 count1 table {tid} not provided")
            return np.asarray(is_, dtype=np.int64), nbig
        dec1 = _l3_c1_dec[tid]
        idx = nbig
        if dec1 is None:
            # oversized injected count1 table: per-bit fallback
            mbits.pos = pos
            if pos > nbits:
                # the big-values LUT walk already ran off the end of the
                # reservoir into cache padding; the per-field reader
                # raised EOFError mid-walk here — mirror the LUT exits
                raise EOFError
            codes = c1[tid]
            maxlen = max(ln for ln, _c in codes)
            while mbits.pos < limit_bit and idx <= 572:
                quad = l3_huff_lookup(mbits, codes, maxlen)
                vals = []
                for v in quad:
                    if v and mbits.read(1):
                        v = -v
                    vals.append(v)
                if mbits.pos > limit_bit:
                    break  # overshoot quad: discarded per the spec
                is_[idx:idx + 4] = vals
                idx += 4
            return np.asarray(is_, dtype=np.int64), idx
        lut, codes, maxlen = dec1
        need = maxlen + 4
        while pos < limit_bit and idx <= 572:
            while cbits < need:
                cbits += 32
                cache = ((cache << 32)
                         | from_bytes(buf[cbyte:cbyte + 4], "big")) \
                    & ((1 << cbits) - 1)
                cbyte += 4
            e = lut[(cache >> (cbits - 8)) & 0xFF]
            if e is not None:
                ln, v0, v1, v2, v3 = e
                cbits -= ln
                pos += ln
            else:
                peek = (cache >> (cbits - maxlen)) & ((1 << maxlen) - 1)
                for ln in range(9, maxlen + 1):
                    q = codes.get((ln, peek >> (maxlen - ln)))
                    if q is not None:
                        v0, v1, v2, v3 = q
                        cbits -= ln
                        pos += ln
                        break
                else:
                    raise ValueError("invalid L3 Huffman code")
            if v0:
                if (cache >> (cbits - 1)) & 1:
                    v0 = -v0
                cbits -= 1
                pos += 1
            if v1:
                if (cache >> (cbits - 1)) & 1:
                    v1 = -v1
                cbits -= 1
                pos += 1
            if v2:
                if (cache >> (cbits - 1)) & 1:
                    v2 = -v2
                cbits -= 1
                pos += 1
            if v3:
                if (cache >> (cbits - 1)) & 1:
                    v3 = -v3
                cbits -= 1
                pos += 1
            if pos > limit_bit:
                break  # overshoot quad: discarded per the spec
            is_[idx] = v0
            is_[idx + 1] = v1
            is_[idx + 2] = v2
            is_[idx + 3] = v3
            idx += 4
        mbits.pos = pos
        if pos > nbits:
            raise EOFError
        return np.asarray(is_, dtype=np.int64), idx

    # memoized requant primitives: both caches hit constantly (spectrum
    # magnitudes repeat, gains repeat per band), and each entry is
    # computed by the EXACT expression the per-line loop used, so the
    # results are bit-identical to the unmemoized reader
    _pow43: dict = {}
    _gain2: dict = {}

    def l3_requantize(g: dict, is_, scf_l, scf_s, bl, bs):
        """Integer spectrum -> float xr with the successive gain
        ladder: 2^((global_gain-210-8*subblock_gain)/4) times
        2^(-mult*(scalefac + preflag*pretab)), mult = (scale+1)/2;
        short-block regions are REORDERED into the line-interleaved
        (i*3+w) layout the IMDCT bank consumes."""
        xr = np.zeros(576)
        gg = g["global_gain"]
        mult = 0.5 * (g["scalefac_scale"] + 1)
        pretab = l3_tables["pretab"]
        pre = g["preflag"]
        short = g["window_switching"] and g["block_type"] == 2
        long_lines = 576
        if short:
            long_lines = 36 if g["mixed_block"] else 0
        il = is_.tolist() if hasattr(is_, "tolist") else list(is_)
        pow43 = _pow43
        gain2 = _gain2
        # long region: iterate nonzero lines only, tracking the band
        # cursor (lines ascend, so the cursor never rewinds)
        sfb = 0
        for i in range(long_lines):
            v = il[i]
            if v:
                while sfb < 22 and i >= bl[sfb + 1]:
                    sfb += 1
                sc = scf_l[sfb] + (pretab[sfb] if pre else 0)
                e = 0.25 * (gg - 210) - mult * sc
                gain = gain2.get(e)
                if gain is None:
                    gain = gain2[e] = 2.0 ** e
                a = v if v > 0 else -v
                p = pow43.get(a)
                if p is None:
                    p = pow43[a] = a ** (4.0 / 3.0)
                xr[i] = (p if v > 0 else -p) * gain
        if not short:
            return xr
        # short region: huffman order is sfb-major, window-major within
        # the sfb; destination is line-interleaved 3*line + win
        s0 = next(
            (s for s in range(13) if bs[s] * 3 == long_lines), None)
        if s0 is None:
            raise ValueError("mixed split not on a short band boundary")
        src = long_lines
        sbg = g["subblock_gain"]
        for s in range(s0, 13):
            width = bs[s + 1] - bs[s]
            base = 3 * bs[s]
            for win in range(3):
                e = (0.25 * (gg - 210 - 8 * sbg[win])
                     - mult * scf_s[min(s, 12)][win])
                gain = gain2.get(e)
                if gain is None:
                    gain = gain2[e] = 2.0 ** e
                for i in range(width):
                    v = il[src]
                    src += 1
                    if v:
                        a = v if v > 0 else -v
                        p = pow43.get(a)
                        if p is None:
                            p = pow43[a] = a ** (4.0 / 3.0)
                        xr[base + 3 * i + win] = \
                            (p if v > 0 else -p) * gain
        return xr

    def l3_granule_subbands(g: dict, xr: np.ndarray, prev: np.ndarray):
        """Zero-or-decoded spectrum xr (576) -> 18 polyphase groups via
        alias reduction, IMDCT, overlap-add, frequency inversion.
        ``prev`` is the per-subband 18-sample overlap store (32, 18)."""
        bt = g["block_type"] if g["window_switching"] else 0
        bands = xr.reshape(32, 18)
        # alias reduction (skip for pure short blocks); the 8
        # butterflies per band boundary run as elementwise numpy ops —
        # same IEEE multiply/add sequence per lane as the scalar loop,
        # so the result is bit-identical
        if bt != 2 or g["mixed_block"]:
            limit = 1 if (bt == 2 and g["mixed_block"]) else 31
            for sb in range(limit):
                a = bands[sb, 17:9:-1].copy()
                b = bands[sb + 1, :8].copy()
                bands[sb, 17:9:-1] = a * CS_V - b * CA_V
                bands[sb + 1, :8] = b * CS_V + a * CA_V
        out = np.zeros((18, 32))
        for sb in range(32):
            sb_bt = bt
            if g["mixed_block"] and sb < 2:
                sb_bt = 0
            X = bands[sb]
            if sb_bt == 2:
                z = np.zeros(36)
                # the three 12-sample short windows overlap at 6-sample
                # offsets starting at 6: [6:18], [12:24], [18:30]
                for w in range(3):
                    xw = IMDCT12 @ X[w::3]
                    z[6 + 6 * w:18 + 6 * w] += xw * WIN_SHORT
                y = z
            else:
                y = IMDCT36 @ X
                if sb_bt == 0:
                    y = y * WIN_LONG
                elif sb_bt == 1:
                    y = y * WIN_START
                else:
                    y = y * WIN_STOP
            out[:, sb] = y[:18] + prev[sb]
            prev[sb] = y[18:]
            if sb & 1:  # frequency inversion: odd subband, odd sample
                out[1::2, sb] = -out[1::2, sb]
        return out

    # ------------------------------------------------------------- #
    # polyphase synthesis (ISO structure, substitute window)
    # ------------------------------------------------------------- #

    class _Synth:
        __slots__ = ("V",)

        def __init__(self):
            self.V = np.zeros(1024)

        def run(self, groups: np.ndarray) -> np.ndarray:
            """groups: (G, 32) subband samples -> (G*32,) PCM floats."""
            V = self.V
            out = np.empty(groups.shape[0] * 32)
            U = np.empty(512)
            for t in range(groups.shape[0]):
                V[64:] = V[:-64]
                V[:64] = N_SYN @ groups[t]
                for i in range(8):
                    U[64 * i:64 * i + 32] = V[128 * i:128 * i + 32]
                    U[64 * i + 32:64 * i + 64] = V[128 * i + 96:128 * i + 128]
                out[t * 32:(t + 1) * 32] = (
                    (U * synth_window).reshape(16, 32).sum(0)
                )
            self.V = V
            return out

    # ------------------------------------------------------------- #
    # stream walk
    # ------------------------------------------------------------- #

    def decode_frames(p: bytes):
        """Walk the stream; return (rate, nch, [per-frame (G, nch, 32)
        subband group arrays]).  Raises ValueError/EOFError on corrupt
        or gated structure."""
        off = 0
        if p[:3] == b"ID3" and len(p) >= 10:
            sz = 0
            for b in p[6:10]:
                if b & 0x80:
                    raise ValueError("bad syncsafe size")
                sz = (sz << 7) | b
            off = 10 + sz
        frames = []
        rate = nch = layer = None
        reservoir = b""
        l3_prev = None
        while off < len(p):
            if p[off:off + 3] == b"TAG" and len(p) - off == 128:
                break  # ID3v1 trailer
            hdr = parse_header(p, off)
            if hdr is None:
                raise ValueError("bad frame header")
            if rate is None:
                rate, nch, layer = hdr["rate"], hdr["nch"], hdr["layer"]
            elif (rate != hdr["rate"] or nch != hdr["nch"]
                  or layer != hdr["layer"]):
                raise ValueError("stream parameter change")
            frame = p[off:off + hdr["frame_len"]]
            if len(frame) < hdr["frame_len"]:
                raise ValueError("truncated frame")
            body = frame[4:]
            crc = None
            if hdr["crc"]:
                if len(body) < 2:
                    raise ValueError("truncated CRC")
                crc = (int.from_bytes(body[:2], "big"), frame[2:4])
                body = body[2:]
            if hdr["layer"] == 1:
                frames.append(layer1_subbands(_Bits(body), hdr, crc))
            elif hdr["layer"] == 2:
                frames.append(layer2_subbands(_Bits(body), hdr, crc))
            else:
                bits = _Bits(body)
                info = l3_side_info(bits, hdr["nch"])
                side_bytes = 17 if hdr["nch"] == 1 else 32
                if bits.pos != side_bytes * 8:
                    raise ValueError("side info misparse")
                if crc is not None:
                    # Layer III protects the side information
                    want, hdr_tail = crc
                    if mpeg_crc16(hdr_tail, body, side_bytes * 8) != want:
                        raise ValueError("CRC mismatch")
                main = body[side_bytes:]
                mdb = info["main_data_begin"]
                if mdb > len(reservoir):
                    raise ValueError("bit reservoir underrun")
                data = (reservoir[len(reservoir) - mdb:] if mdb else b"") \
                    + main
                mbits = _Bits(data)
                if l3_prev is None:
                    l3_prev = np.zeros((hdr["nch"], 32, 18))
                groups = np.zeros((36, hdr["nch"], 32))
                gr0_scf = [[0] * 22 for _ in range(hdr["nch"])]
                bl = bs = None
                if l3_tables is not None:
                    bl = l3_tables["sfb_long"].get(hdr["rate"])
                    bs = l3_tables["sfb_short"].get(hdr["rate"])
                for gr in range(2):
                    xrs = []
                    metas = []
                    gs = info["granules"][gr]
                    for ch in range(hdr["nch"]):
                        g = gs[ch]
                        start = mbits.pos
                        scf_l, scf_s = l3_scalefactors(
                            g, gr, info["scfsi"][ch], mbits.read,
                            gr0_scf[ch])
                        if gr == 0:
                            gr0_scf[ch] = scf_l
                        part2 = mbits.pos - start
                        if part2 > g["part2_3_length"]:
                            raise ValueError("part2 overruns the granule")
                        limit = start + g["part2_3_length"]
                        if g["big_values"] == 0 and mbits.pos == limit:
                            xr = np.zeros(576)  # silence: table-free
                            hend = 0
                        else:
                            if l3_tables is None or bl is None \
                                    or bs is None:
                                # nonzero spectrum without the Annex-B
                                # tables (set_l3_tables): gated
                                raise ValueError(
                                    "nonzero L3 spectrum gated")
                            is_, hend = l3_huffman_spectrum(
                                mbits, g, limit, bl)
                            xr = l3_requantize(
                                g, is_, scf_l, scf_s, bl, bs)
                        mbits.pos = limit
                        xrs.append(xr)
                        metas.append((scf_l, hend, scf_s))
                    if hdr["mode"] == 1 and hdr["nch"] == 2 and any(
                        x.any() for x in xrs
                    ):
                        ms_on = bool(hdr["mode_ext"] & 2)
                        is_on = bool(hdr["mode_ext"] & 1)
                        ga, gb = gs[0], gs[1]
                        if ms_on or is_on:
                            if (ga["block_type"] != gb["block_type"]
                                    or ga["mixed_block"]
                                    != gb["mixed_block"]
                                    or ga["window_switching"]
                                    != gb["window_switching"]):
                                raise ValueError(
                                    "joint channels disagree on blocks")
                        r2 = 2.0 ** 0.5
                        if is_on:
                            # intensity stereo: zero-part bands get
                            # positioned by is_pos = right-granule
                            # scalefactor, tan(pos*pi/12) ratios.
                            # Long layouts (incl. start/stop windows)
                            # bound at the right channel's huffman
                            # end; SHORT blocks detect the zero part
                            # PER WINDOW by scanning the reordered
                            # right spectrum top-down (the ISO
                            # decoder's value scan), mixed blocks
                            # additionally extend into the long
                            # region only when every short window of
                            # the right channel is silent
                            left, right = xrs
                            out_l, out_r = left.copy(), right.copy()

                            def _couple(sl, pos):
                                if pos > 7:
                                    raise ValueError("illegal is_pos")
                                if pos == 7:
                                    _ms(sl)
                                    return
                                ratio = np.tan(pos * np.pi / 12.0)
                                out_l[sl] = left[sl] * (
                                    ratio / (1.0 + ratio))
                                out_r[sl] = left[sl] * (
                                    1.0 / (1.0 + ratio))

                            def _ms(sl):
                                if ms_on:
                                    m, s_ = left[sl], right[sl]
                                    out_l[sl] = (m + s_) / r2
                                    out_r[sl] = (m - s_) / r2

                            scf_r = metas[1][0]
                            if ga["block_type"] != 2 \
                                    or not ga["window_switching"]:
                                bound = metas[1][1]
                                for sfb in range(22):
                                    lo_b, hi_b = bl[sfb], bl[sfb + 1]
                                    sl = slice(lo_b, hi_b)
                                    if lo_b >= bound:
                                        # band 21 transmits no
                                        # scalefactor: its is_pos is
                                        # band 20's (the reference-
                                        # decoder convention)
                                        _couple(sl, scf_r[min(sfb, 20)])
                                    else:
                                        _ms(sl)
                            else:
                                scf_r_s = metas[1][2]
                                mixed = ga["mixed_block"]
                                s_min = next(
                                    (s for s in range(13)
                                     if bs[s] * 3 == (36 if mixed
                                                      else 0)), None)
                                if s_min is None:
                                    raise ValueError(
                                        "mixed split not on a short "
                                        "band boundary")
                                win_bounds = []
                                for w in range(3):
                                    b = s_min
                                    for s in range(12, s_min - 1, -1):
                                        sl = slice(3 * bs[s] + w,
                                                   3 * bs[s + 1] + w, 3)
                                        if np.any(right[sl]):
                                            b = s + 1
                                            break
                                    win_bounds.append(b)
                                for w in range(3):
                                    for s in range(s_min, 13):
                                        sl = slice(3 * bs[s] + w,
                                                   3 * bs[s + 1] + w, 3)
                                        if s >= win_bounds[w]:
                                            # band 12 transmits no
                                            # scalefactor: reuse band
                                            # 11's is_pos (the long
                                            # path's min(sfb, 20)
                                            # convention)
                                            _couple(
                                                sl,
                                                scf_r_s[min(s, 11)][w])
                                        else:
                                            _ms(sl)
                                if mixed:
                                    n_long = next(
                                        s for s in range(23)
                                        if bl[s] >= 36)
                                    if all(b == s_min
                                           for b in win_bounds):
                                        # right's short region is
                                        # silent: the zero part
                                        # reaches into the long bands
                                        bound_l = 0
                                        for sfb in range(
                                                n_long - 1, -1, -1):
                                            if np.any(right[
                                                    bl[sfb]:bl[sfb + 1]
                                            ]):
                                                bound_l = sfb + 1
                                                break
                                        for sfb in range(n_long):
                                            sl = slice(bl[sfb],
                                                       bl[sfb + 1])
                                            if sfb >= bound_l:
                                                _couple(sl, scf_r[sfb])
                                            else:
                                                _ms(sl)
                                    else:
                                        _ms(slice(0, 36))
                            xrs = [out_l, out_r]
                        elif ms_on:
                            m, s_ = xrs
                            xrs = [(m + s_) / r2, (m - s_) / r2]
                    for ch in range(hdr["nch"]):
                        sb_groups = l3_granule_subbands(
                            gs[ch], xrs[ch], l3_prev[ch])
                        groups[18 * gr:18 * gr + 18, ch, :] = sb_groups
                frames.append(groups)
                reservoir = (reservoir + main)[-511:]
            off += hdr["frame_len"]
        if not frames:
            raise ValueError("no frames")
        return rate, nch, frames

    def decode_mp3(p: bytes) -> "dict | None":
        if p is None or len(p) < 4:
            return None
        looks = p[:3] == b"ID3" or (
            p[0] == 0xFF and (p[1] & 0xE0) == 0xE0)
        if not looks:
            return None
        try:
            rate, nch, frames = decode_frames(bytes(p))
        except (ValueError, EOFError, IndexError):
            return None
        synths = [_Synth() for _ in range(nch)]
        chans = [
            np.concatenate([s.run(f[:, ch, :]) for f in frames])
            for ch, s in enumerate(synths)
        ]
        pcm = np.empty(len(chans[0]) * nch)
        for ch in range(nch):
            pcm[ch::nch] = chans[ch]
        # int16 presentation (every float-output codec's convention
        # here): round-half-even, clipped
        s16 = np.clip(np.rint(pcm * 32767.0), -32768, 32767).astype(np.int64)
        total = int(s16.sum())
        return {
            "sample_rate": int(rate), "channels": int(nch), "bits": 16,
            "n_samples": int(s16.size),
            "s_min": int(s16.min()), "s_max": int(s16.max()),
            "s_sum": total, "s_sq_sum": int((s16 * s16).sum()),
            "s_mean": total / s16.size,
        }

    decode_mp3._decode_frames = decode_frames  # test hook: pre-synthesis
    decode_mp3._synth_class = _Synth
    decode_mp3._requant = requant
    decode_mp3._l2_requant = l2_requant
    decode_mp3._l2_table = l2_table
    decode_mp3._scalefactors = SCALEFACTORS
    return decode_mp3


class _Mp3DecoderFacade:
    """Callable module-level decoder that rebuilds itself whenever
    :func:`set_iso_windows` / :func:`clear_iso_windows` changes the
    window state (a plain ``_make_mp3_sample_decoder()`` instance
    captures the window at build time, so a frozen instance would
    silently ignore the swap — a round-7 review finding).  Attribute
    access (the test hooks) delegates to the current build."""

    def __init__(self):
        self._fn = None
        self._epoch = -1

    def _inner(self):
        if self._fn is None or self._epoch != _WINDOW_EPOCH:
            self._fn = _make_mp3_sample_decoder()
            self._epoch = _WINDOW_EPOCH
        return self._fn

    def __call__(self, p):
        return self._inner()(p)

    def __getattr__(self, name):
        return getattr(self._inner(), name)


#: module-level instance for unit tests (Spark tasks closure-build via
#: the factory, capturing the window state at stage-build time)
decode_mp3_samples = _Mp3DecoderFacade()
