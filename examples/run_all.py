"""Run every example (examples/cpp/run_all.cpp equivalent)."""
import importlib
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODULES = ["lasso", "lasso_path", "logistic", "lp", "maros_qp", "qp", "nonneg_ls", "svm",
           "quantile_regression", "huber_fit", "sdp", "portfolio",
           "lasso_path_batched", "native_runtime", "mpc_scenarios",
           "hyperparam_opt", "optnet_qp", "huge_qp"]

for name in MODULES:
    mod = importlib.import_module(name)
    for fn_name in ("main", "lp_eq", "lp_ineq"):
        if name == "lp":
            mod.lp_eq(); mod.lp_ineq(); break
        if hasattr(mod, "main"):
            mod.main(); break
