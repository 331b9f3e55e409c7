from .runner import (  # noqa: F401
    Public,
    compile_parties,
    mpc_context,
    run_parties,
    run_parties_spmd,
    shard_map_parties,
)
