from knp_emi_cgx_tpu.ops.assembly import KNPEMIAssembler  # noqa: F401
from knp_emi_cgx_tpu.ops.spmv import csr_matvec, csr_to_dense  # noqa: F401
