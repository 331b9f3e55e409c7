#!/usr/bin/env python
"""Dealer CLI: fill tuple caches from a shipped request trace, in a process
physically separate from every party.

Flow (reference analogue: curl/mpc/provider/ttp_provider.py:256-306 runs the
TTP as a server process; here the request loop is replaced by the
offline/online cache split):

    # on a party host: record + ship requests
    curl_tpu.trace(True); <run the workload once>; curl_tpu.trace(False)
    provider.save_requests("reqs.pkl")

    # on the dealer host (own seed, never shared):
    python scripts/dealer.py --requests reqs.pkl --world-size 2 \
        --seed 1234 --out /shared/tuples

    # on each party host: load ONLY its own file
    dealer.attach_party_caches(["/shared/tuples.party0.npz", ...])

Usage: python scripts/dealer.py --requests F --world-size N --out PREFIX
       [--seed S] [--provider TFP|TTP] [--config FILE]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--requests", required=True,
                    help="request trace file from TupleProvider.save_requests")
    ap.add_argument("--world-size", type=int, required=True)
    ap.add_argument("--out", required=True,
                    help="output prefix; writes {out}.party{r}.npz per party")
    ap.add_argument("--seed", type=int, default=0,
                    help="dealer-local randomness seed (keep on this host)")
    ap.add_argument("--provider", default="TFP", choices=["TFP", "TTP"])
    ap.add_argument("--engine", default="jax", choices=["jax", "native"],
                    help="tuple generator: 'jax' replays the provider under "
                         "vmap; 'native' uses the multithreaded C++ engine "
                         "(native/tuple_engine.cc)")
    ap.add_argument("--config", default=None)
    args = ap.parse_args(argv)

    import curl_tpu
    from curl_tpu.mpc import get_default_provider, set_default_provider
    from curl_tpu.mpc.provider import dealer

    curl_tpu.init(config_file=args.config, world_size=args.world_size,
                  seed=args.seed)
    set_default_provider(args.provider)
    provider = get_default_provider()
    provider.load_requests(args.requests)

    if args.engine == "native":
        from curl_tpu.mpc.provider import native_engine

        entries = native_engine.fill_standalone_native(
            provider.requests, args.world_size, args.seed
        )
    else:
        entries = dealer.fill_standalone(
            provider.requests, args.world_size, args.seed, provider=provider
        )
    paths = dealer.save_party_caches(entries, args.out, args.world_size)
    for p in paths:
        print(p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
