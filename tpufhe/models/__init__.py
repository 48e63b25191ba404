"""Example applications / workloads (the reference's examples/ directory):

- bfv_basic: encrypt/add/mul/decrypt walkthrough (examples/bfv_basic.rs)
- pir: SealPIR and MulPIR private information retrieval (examples/{seal,mul}pir.rs)
- voting: multiparty private tally (examples/voting.rs)
"""

from tpufhe.models.pir import run_mulpir, run_sealpir
from tpufhe.models.voting import run_voting
from tpufhe.models.bfv_basic import run_bfv_basic

__all__ = ["run_mulpir", "run_sealpir", "run_voting", "run_bfv_basic"]
