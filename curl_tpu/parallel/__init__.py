from .runner import (  # noqa: F401
    compile_parties_cached,
    Public,
    compile_parties,
    mpc_context,
    run_parties,
    run_parties_spmd,
    shard_map_parties,
)
