package de.bwaldvogel.liblinear;

public enum SolverType { L2R_LR, L2R_LR_DUAL, L2R_L2LOSS_SVC, L1R_LR, MCSVM_CS }
