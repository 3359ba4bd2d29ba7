#!/usr/bin/env python
"""One-off decoder crash-hunt at round scale (the CI suite runs a
capped hypothesis version — tests/test_codec_fuzz.py): every decoder
in that suite's DECODERS map plus this round's rewritten hot paths
(rice-LUT FLAC content, progressive-refinement JPEG, large-design
Vorbis, dense Layer III MP3), pounded with byte flips / truncations /
insertions / splices.  A decoder must return None or a dict — never
raise.

Usage: python tools/crash_hunt.py [mutants_per_seed]
"""
import importlib.util
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def main():
    n_mut = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    CF = load(os.path.join(REPO, "tests", "test_codec_fuzz.py"), "cf")
    decoders = dict(CF.DECODERS)
    from whisper_spark.operators.vorbis import decode_vorbis_samples
    decoders["vorbis"] = decode_vorbis_samples
    seeds = {k: [v] for k, v in CF.SEEDS.items()}

    # this round's rewritten paths, at denser content than the CI seeds
    BF = load(os.path.join(REPO, "tools", "bench_flac_rice.py"), "bf")
    seeds.setdefault("flac", []).append(
        BF.build(2, 512, porder=2, noise=900)[0])
    BJ = load(os.path.join(REPO, "tools", "bench_jpeg_progressive.py"),
              "bj")
    for name, p, _px in BJ.payloads():
        seeds.setdefault("jpeg_prog", []).append(p)
    BV = load(os.path.join(REPO, "tools", "bench_vorbis_residue.py"),
              "bv")
    seeds.setdefault("vorbis", []).append(BV.build(4, 1)[0])
    seeds.setdefault("vorbis", []).append(BV.build_large(2, 1)[0])
    BM = load(os.path.join(REPO, "tools", "bench_mp3_l3.py"), "bm")
    tabs = BM.T._l3_test_tables()
    from whisper_spark.operators import mp3 as mp3_mod
    mp3_mod.set_l3_tables(**tabs)
    try:
        seeds.setdefault("mp3_l3", []).append(BM.stream(tabs))

        from whisper_spark.operators.multimodal import parse_media_header

        rng = random.Random(0xDEC0DE)
        total = 0
        for name, seed_list in sorted(seeds.items()):
            dec = decoders.get(name)
            if dec is None:
                continue
            for si, seed in enumerate(seed_list):
                for _ in range(n_mut):
                    m = bytearray(seed)
                    op = rng.randrange(4)
                    if op == 0:
                        for _ in range(rng.randrange(1, 6)):
                            m[rng.randrange(len(m))] ^= \
                                rng.randrange(1, 256)
                    elif op == 1:
                        m = m[:rng.randrange(1, len(m))]
                    elif op == 2:
                        at = rng.randrange(len(m))
                        m[at:at] = bytes(
                            rng.randrange(256)
                            for _ in range(rng.randrange(1, 12)))
                    else:
                        a = rng.randrange(len(m))
                        b = rng.randrange(len(m))
                        m = m[:a] + m[b:]
                    p = bytes(m)
                    out = dec(p)
                    assert out is None or isinstance(out, dict), \
                        (name, si, type(out))
                    hp = parse_media_header(p)
                    assert hp is None or isinstance(hp, dict)
                    total += 1
                print(f"{name}[{si}]: {n_mut} mutants clean",
                      flush=True)
        print(f"crash-hunt: {total} mutants, zero escapes")
    finally:
        mp3_mod.clear_l3_tables()


if __name__ == "__main__":
    main()
