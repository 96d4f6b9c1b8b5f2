from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI, KNPEMIState  # noqa: F401
