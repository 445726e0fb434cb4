from . import curation, discovery, harvest, ledger, ops

__all__ = ["curation", "discovery", "harvest", "ledger", "ops"]
