"""End-to-end workload tests: plain-language oracle vs DSL program on the
dummy backend.

Reference test tier: test/end-to-end/ (12 workloads, SURVEY.md §4 tier 5).
BoxBlur/Gx/Gy/Hamming/L2/DotProduct/MatrixVector use the reference's DSL
programs verbatim (e.g. BoxBlurTest.cpp:197-213, HammingDistanceTest.cpp:38-45);
RobertsCross/Laplace/Cardio/Linear/Polynomial are stubs or aspirational
fixtures in the reference (CardioTest.cpp:37-79) and are authored here to the
same pattern.
"""

import random

from helpers import assert_result, run_program


def run(inputs, program, outputs):
    from abc_tpu.runtime.dummy import DummyCiphertextFactory
    factory = DummyCiphertextFactory()
    rv, pairs = run_program(inputs, program, outputs, factory)
    return factory, pairs


def int_list(vals):
    return "{" + ",".join(str(v) for v in vals) + "}"


# --- hamming distance ---------------------------------------------------------

def hamming_distance(x, y):
    # ref oracle: HammingDistanceTest.cpp:15-23
    assert len(x) == len(y)
    return sum(int(a != b) for a, b in zip(x, y))


HAMMING_PROGRAM = """
    int sum = 0;
    for (int i = 0; i < n; i = i + 1) {
      sum = sum + (x[i]-y[i])*(x[i]-y[i]);
    }
    return sum;
"""


def test_hamming_distance_cleartext():
    # ref: HammingDistanceTest.cpp clearTextEvaluation (expected = 2)
    inputs = "int x = {1,1,0,1}; int y = {1,0,1,1}; int n = 4;"
    factory, pairs = run(inputs, HAMMING_PROGRAM, "sum = sum;")
    assert_result(factory, pairs, {"sum": [hamming_distance([1, 1, 0, 1], [1, 0, 1, 1])]})
    assert hamming_distance([1, 1, 0, 1], [1, 0, 1, 1]) == 2


# --- L2 distance (squared) ------------------------------------------------------

def test_l2_distance_cleartext():
    x = [10, 12, -4, 7]
    y = [3, -2, 9, 1]
    expected = sum((a - b) ** 2 for a, b in zip(x, y))
    inputs = f"int x = {int_list(x)}; int y = {int_list(y)}; int n = 4;"
    factory, pairs = run(inputs, HAMMING_PROGRAM, "sum = sum;")
    assert_result(factory, pairs, {"sum": [expected]})


# --- dot product -----------------------------------------------------------------

def test_dot_product_cleartext():
    x = [7, 2, 0, 5, 9]
    y = [1, 3, 4, 2, 6]
    expected = sum(a * b for a, b in zip(x, y))
    inputs = f"int x = {int_list(x)}; int y = {int_list(y)}; int size = 5;"
    program = """
      int sum = 0;
      for (int i = 0; i < size; i = i + 1) {
          sum = sum + x[i]*y[i];
      }
      return sum;
    """
    factory, pairs = run(inputs, program, "sum = sum;")
    assert_result(factory, pairs, {"sum": [expected]})


# --- matrix-vector product --------------------------------------------------------

def test_matrix_vector_product_cleartext():
    # ref: MatrixVectorProductTest.cpp (row-major matrix, result[i]=Σ m[i][j]v[j])
    m = 3
    matrix = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    vec = [1, 0, 2]
    expected = [sum(matrix[i * m + j] * vec[j] for j in range(m)) for i in range(m)]
    inputs = (f"int matrix = {int_list(matrix)}; int vec = {int_list(vec)};"
              " int m = 3; int n = 3;")
    program = """
      int result = {0,0,0};
      for (int i = 0; i < m; i = i  + 1) {
        int sum = 0;
        for (int j = 0; j < n; j = j + 1) {
          sum = sum + matrix[i*m+j]*vec[j];
         }
        result[i] = sum;
      }
      return result;
    """
    factory, pairs = run(inputs, program, "result = result;")
    assert_result(factory, pairs, {"result": expected})


# --- image kernels -----------------------------------------------------------------

def _conv3x3(img, img_size, weights):
    """Shared oracle for BoxBlur/Gx/Gy with the reference's index arithmetic
    (weightMatrix[(i+1)*3+j+1] * img[(x+i)*imgSize+(y+j)])."""
    img2 = list(img)
    for x in range(1, img_size - 1):
        for y in range(1, img_size - 1):
            value = 0
            for j in range(-1, 2):
                for i in range(-1, 2):
                    value += weights[(i + 1) * 3 + j + 1] * img[(x + i) * img_size + (y + j)]
            img2[img_size * x + y] = value
    return img2


KERNEL_PROGRAM_TEMPLATE = """
    int weightMatrix = %s;
    int img2 = img;
    for (int x = 1; x < imgSize-1; x = x + 1) {
      for (int y = 1; y < imgSize-1; y = y + 1) {
        int value = 0;
        for (int j = -1; j < 2; j = j + 1) {
          for (int i = -1; i < 2; i = i + 1) {
            value = value + weightMatrix[(i + 1)*3 +j + 1]
                *img[((x + i)*imgSize + (y + j))];
          }
        }
        img2[imgSize*x + y] = value;
      }
    }
    return img2;
"""


def _random_image(size, seed):
    rng = random.Random(seed)
    return [rng.randrange(0, 256) for _ in range(size * size)]


def _run_kernel(weights, seed=42, size=8):
    img = _random_image(size, seed)
    expected = _conv3x3(img, size, weights)
    inputs = f"int img = {int_list(img)}; int imgSize = {size};"
    program = KERNEL_PROGRAM_TEMPLATE % int_list(weights)
    factory, pairs = run(inputs, program, "img2 = img2;")
    assert_result(factory, pairs, {"img2": expected})


def test_box_blur_cleartext():
    # ref: BoxBlurTest.cpp:197-213
    _run_kernel([1] * 9)


def test_gx_kernel_cleartext():
    # ref: GxKernelTest.cpp
    _run_kernel([1, 2, 1, 0, 0, 0, -1, -1, -1], seed=1)


def test_gy_kernel_cleartext():
    # ref: GyKernelTest.cpp
    _run_kernel([1, 0, -1, 2, 0, -2, 1, 0, -1], seed=2)


def test_laplace_sharpening_cleartext():
    # authored per LaplaceSharpeningTest.cpp's aspirational fixture:
    # img2[x*size+y] = 2*img[x*size+y] - Σ w[i][j]*img[(x+i)*size+(y+j)]
    size = 8
    img = _random_image(size, 3)
    weights = [1, 1, 1, 1, -8, 1, 1, 1, 1]
    conv = _conv3x3(img, size, weights)
    expected = list(img)
    for x in range(1, size - 1):
        for y in range(1, size - 1):
            expected[x * size + y] = 2 * img[x * size + y] - conv[x * size + y]
    inputs = f"int img = {int_list(img)}; int imgSize = {size};"
    program = """
    int weightMatrix = {1, 1, 1, 1, -8, 1, 1, 1, 1};
    int img2 = img;
    for (int x = 1; x < imgSize-1; x = x + 1) {
      for (int y = 1; y < imgSize-1; y = y + 1) {
        int value = 0;
        for (int j = -1; j < 2; j = j + 1) {
          for (int i = -1; i < 2; i = i + 1) {
            value = value + weightMatrix[(i + 1)*3 +j + 1]
                *img[((x + i)*imgSize + (y + j))];
          }
        }
        img2[imgSize*x + y] = 2*img[imgSize*x + y] - value;
      }
    }
    return img2;
    """
    factory, pairs = run(inputs, program, "img2 = img2;")
    assert_result(factory, pairs, {"img2": expected})


def test_roberts_cross_cleartext():
    # authored (reference RobertsCrossTest.cpp is a stub):
    # g1 = img[x][y] - img[x+1][y+1]; g2 = img[x+1][y] - img[x][y+1];
    # out = g1² + g2²
    size = 8
    img = _random_image(size, 4)
    expected = list(img)
    for x in range(size - 1):
        for y in range(size - 1):
            g1 = img[x * size + y] - img[(x + 1) * size + (y + 1)]
            g2 = img[(x + 1) * size + y] - img[x * size + (y + 1)]
            expected[x * size + y] = g1 * g1 + g2 * g2
    inputs = f"int img = {int_list(img)}; int imgSize = {size};"
    program = """
    int img2 = img;
    for (int x = 0; x < imgSize-1; x = x + 1) {
      for (int y = 0; y < imgSize-1; y = y + 1) {
        int g1 = img[x*imgSize+y] - img[(x+1)*imgSize+(y+1)];
        int g2 = img[(x+1)*imgSize+y] - img[x*imgSize+(y+1)];
        img2[x*imgSize+y] = g1*g1 + g2*g2;
      }
    }
    return img2;
    """
    factory, pairs = run(inputs, program, "img2 = img2;")
    assert_result(factory, pairs, {"img2": expected})


# --- cardio risk score ------------------------------------------------------------

def cardio_risk_score(sex_male, antecedents, smoker, diabetes, pressure,
                      age, hdl, height, weight, phy_act, drinking):
    """Plain oracle for the SoK cardio risk workload (authored; the reference
    test is a TODO stub, CardioTest.cpp:46-49)."""
    score = 0
    score += int(sex_male and age > 50)
    score += int((not sex_male) and age > 60)
    score += int(antecedents)
    score += int(smoker)
    score += int(diabetes)
    score += int(pressure)
    score += int(hdl < 40)
    score += int(weight > height - 90)
    score += int(phy_act < 30)
    score += int(sex_male and drinking > 3)
    score += int((not sex_male) and drinking > 2)
    return score


CARDIO_PROGRAM = """
    int r = 0;
    if (sex == 1) { if (age > 50) { r = r + 1; } }
    if (sex == 0) { if (age > 60) { r = r + 1; } }
    r = r + antecedents;
    r = r + smoker;
    r = r + diabetes;
    r = r + high_blood_pressure;
    if (hdl_cholesterol < 40) { r = r + 1; }
    if (weight > height - 90) { r = r + 1; }
    if (phy_activity < 30) { r = r + 1; }
    if (sex == 1) { if (drinking_habits > 3) { r = r + 1; } }
    if (sex == 0) { if (drinking_habits > 2) { r = r + 1; } }
    return r;
"""


def test_cardio_cleartext():
    # input values from the reference fixture (CardioTest.cpp:13-26)
    args = dict(sex_male=True, antecedents=True, smoker=False, diabetes=False,
                pressure=True, age=22, hdl=12, height=53, weight=73,
                phy_act=10, drinking=0)
    expected = cardio_risk_score(**args)
    inputs = """
      int sex = 1; int antecedents = 1; int smoker = 0; int diabetes = 0;
      int high_blood_pressure = 1; int age = 22; int hdl_cholesterol = 12;
      int height = 53; int weight = 73; int phy_activity = 10;
      int drinking_habits = 0;
    """
    factory, pairs = run(inputs, CARDIO_PROGRAM, "riskScore = r;")
    assert_result(factory, pairs, {"riskScore": [expected]})
    assert expected == 5  # antecedents + pressure + hdl + weight + phy_activity


# --- kernel-method workloads ---------------------------------------------------------

def test_linear_kernel_cleartext():
    # authored (reference LinearKernelTest.cpp is a stub): k(x,y) = <x,y> + c
    x = [2, -1, 3, 0]
    y = [5, 4, -2, 1]
    c = 7
    expected = sum(a * b for a, b in zip(x, y)) + c
    inputs = f"int x = {int_list(x)}; int y = {int_list(y)}; int n = 4; int c = 7;"
    program = """
      int sum = 0;
      for (int i = 0; i < n; i = i + 1) { sum = sum + x[i]*y[i]; }
      sum = sum + c;
      return sum;
    """
    factory, pairs = run(inputs, program, "k = sum;")
    assert_result(factory, pairs, {"k": [expected]})


def test_polynomial_kernel_cleartext():
    # authored: k(x,y) = (<x,y> + c)^d with d=2
    x = [1, 2, 3]
    y = [4, 0, -1]
    c = 2
    dot = sum(a * b for a, b in zip(x, y))
    expected = (dot + c) ** 2
    inputs = f"int x = {int_list(x)}; int y = {int_list(y)}; int n = 3; int c = 2;"
    program = """
      int sum = 0;
      for (int i = 0; i < n; i = i + 1) { sum = sum + x[i]*y[i]; }
      sum = sum + c;
      sum = sum * sum;
      return sum;
    """
    factory, pairs = run(inputs, program, "k = sum;")
    assert_result(factory, pairs, {"k": [expected]})
