"""JAX backend selection hardening.

This environment routes TPU access through an experimental plugin whose
platform registration is flaky: depending on process startup it may be
known as 'axon', as 'tpu', or fail to resolve while JAX_PLATFORMS still
says 'axon'. ensure_backend() makes first device use robust: honor an
explicit FLOXER_TPU_PLATFORM override, otherwise try the configured
platforms and fall back to automatic selection when resolution fails.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("floxer-tpu")

_ensured = False


def _tunnel_reachable(ports=(8113, 8093, 8082), timeout=2.0) -> bool:
    """True if the local TPU tunnel relay accepts on any known port.

    When the relay process dies, the plugin's first device use retries
    the dial forever — jax.devices() hangs instead of raising. A refused
    TCP connect is instant, so probing first lets a dead tunnel degrade
    to the CPU backend in milliseconds instead of hanging the process."""
    import socket

    for port in ports:
        sock = socket.socket()
        sock.settimeout(timeout)
        try:
            if sock.connect_ex(("127.0.0.1", port)) == 0:
                return True
        except OSError:
            pass
        finally:
            sock.close()
    return False


def ensure_backend() -> str:
    """Initialize a working JAX backend; returns the backend name."""
    global _ensured
    import jax

    override = os.environ.get("FLOXER_TPU_PLATFORM")
    if override and not _ensured:
        jax.config.update("jax_platforms", override)

    if not _ensured and not override:
        # with the axon pool configured, a dead tunnel hangs jax.devices()
        # in the plugin's dial-retry EVEN when JAX_PLATFORMS=cpu is set in
        # the env (only a config-level platform selection avoids the
        # plugin path) — so probe first and force cpu via config
        if os.environ.get("PALLAS_AXON_POOL_IPS") and not _tunnel_reachable():
            logger.warning(
                "TPU tunnel relay unreachable; falling back to the CPU "
                "backend for this process"
            )
            jax.config.update("jax_platforms", "cpu")

    if not _ensured:
        # persistent compilation cache: kernel shapes recur across runs, and
        # compiles through the TPU tunnel are expensive
        cache_dir = os.environ.get(
            "FLOXER_TPU_JAX_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "floxer_tpu", "jax_cache"
            ),
        )
        if cache_dir != "off":
            try:
                os.makedirs(cache_dir, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0.5
                )
            except Exception as error:  # noqa: BLE001
                logger.debug("compilation cache unavailable: %s", error)

    try:
        jax.devices()
    except RuntimeError as error:
        if _ensured:
            raise
        logger.debug(
            "backend init failed (%s); falling back to automatic platform "
            "selection",
            error,
        )
        jax.config.update("jax_platforms", "")
        jax.devices()
    _ensured = True
    return jax.default_backend()
