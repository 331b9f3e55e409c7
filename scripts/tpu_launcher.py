#!/usr/bin/env python3
"""Multi-host party launcher for real TPU deployments.

Parity scope: reference scripts/aws_launcher.py (SSH-driven multi-node
launch with WORLD_SIZE/RANK/RENDEZVOUS env). On TPU the transport is
jax.distributed + the ICI/DCN fabric instead of Gloo sockets:

  * every host runs this launcher with --coordinator <host:port>
    --num-hosts N --host-id i
  * jax.distributed.initialize() forms the global device mesh
  * the party axis is laid out across hosts (one party per host by
    default); protocol code runs under shard_map exactly as in simulation

Example (2 hosts, 1 party each):
  host0$ python scripts/tpu_launcher.py --coordinator host0:1234 \
             --num-hosts 2 --host-id 0 --script my_protocol.py
  host1$ python scripts/tpu_launcher.py --coordinator host0:1234 \
             --num-hosts 2 --host-id 1 --script my_protocol.py

The target script receives a ready Mesh via curl_tpu.parallel and must
define `main(mesh, world_size)`.
"""

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", required=True, help="host:port of host 0")
    parser.add_argument("--num-hosts", type=int, required=True)
    parser.add_argument("--host-id", type=int, required=True)
    parser.add_argument("--world-size", type=int, default=None,
                        help="MPC parties (default: one per host)")
    parser.add_argument("--script", required=True)
    args = parser.parse_args(argv)
    if not 0 <= args.host_id < args.num_hosts:
        parser.error(f"--host-id {args.host_id} outside [0, {args.num_hosts})")
    ws = args.world_size or args.num_hosts
    if ws < 2:
        parser.error(f"world size {ws} < 2: MPC needs at least two parties")
    return args


def build_mesh(devices, world_size: int):
    """(party, data) mesh over the global device list; data axis absorbs
    the per-party device surplus."""
    import numpy as np
    from jax.sharding import Mesh

    if len(devices) < world_size:
        raise ValueError(
            f"{len(devices)} devices cannot host {world_size} parties"
        )
    n_data = len(devices) // world_size
    return Mesh(
        np.array(devices)[: world_size * n_data].reshape(world_size, n_data),
        ("party", "data"),
    )


def run_script(path, mesh, world_size):
    spec = importlib.util.spec_from_file_location("protocol_script", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(mesh, world_size)


def main(argv=None):
    args = parse_args(argv)

    import jax

    if args.num_hosts > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )

    world_size = args.world_size or args.num_hosts
    mesh = build_mesh(jax.devices(), world_size)
    run_script(args.script, mesh, world_size)


if __name__ == "__main__":
    main()
