"""Physical constants (SI units, kmol-based, Cantera-compatible conventions).

The whole framework works in Cantera's unit system so trajectory artifacts are
directly comparable with the reference pipeline's outputs
(reference: CRNN_TEMP_PRED_MODEL_TRAINING_DATASET_GENERATION/simul_data_gene_fix_chain_2D.py):
  temperature  K
  pressure     Pa
  density      kg/m^3
  concentration kmol/m^3
  energy       J, per-kmol molar quantities
"""

# Universal gas constant [J / (kmol K)]  (CODATA 2018, Cantera value)
GAS_CONSTANT = 8314.462618

# Universal gas constant [J / (mol K)]
R_J_MOL = 8.314462618

# Gas constant in kcal/(mol K) -- used by the CRNN feature vector
# (reference: SURROGATE_MODEL_TRAINING/Eoff_surrogate_model_training.py:44)
R_KCAL_MOL = 1.9872036e-3

# One standard atmosphere [Pa] -- the reference pressure of NASA7 polynomials
ONE_ATM = 101325.0

# Thermodynamic calorie [J/cal]; mechanism YAMLs use cal/mol activation energies
CAL_TO_J = 4.184

# Atomic weights [kg/kmol] (IUPAC 2021 conventional values, matching Cantera)
ATOMIC_WEIGHTS = {
    "H": 1.008,
    "C": 12.011,
    "O": 15.999,
    "N": 14.007,
    "AR": 39.95,
    "HE": 4.002602,
    "S": 32.06,
    "CL": 35.45,
}
