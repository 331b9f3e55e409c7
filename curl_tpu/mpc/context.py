"""run_multiprocess decorator (reference: curl/mpc/context.py:36).

The reference forks one OS process per party. The TPU-native runtime runs
all parties as one vmapped XLA program, so the decorator simply binds the
simulated-party session around the function — same call-site surface:

    @run_multiprocess(world_size=3)
    def protocol():
        x = curl_tpu.cryptensor([1.0])
        return x.get_plain_text()

    result = protocol()   # list with one entry per party, like the reference
"""

from __future__ import annotations

import functools


def run_multiprocess(world_size: int, maskable: bool = False):
    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            import curl_tpu

            prev = curl_tpu._session.world_size if curl_tpu.is_initialized() else None
            curl_tpu.init(world_size=world_size)
            try:
                result = fn(*args, **kwargs)
            except Exception:
                # fail-stop semantics: reference returns None when any party
                # process fails (context.py:102-105) — but unlike a crashed
                # subprocess we have the traceback right here, so log it
                # instead of losing it
                import logging

                logging.getLogger("curl_tpu").exception(
                    "run_multiprocess party function raised (returning None "
                    "per fail-stop semantics)"
                )
                return None
            finally:
                if prev is not None:
                    curl_tpu.init(world_size=prev)
            # every simulated party observes the same return value
            return [result] * world_size

        return wrapper

    return decorator
