from . import discovery, harvest, ledger

__all__ = ["discovery", "harvest", "ledger"]
