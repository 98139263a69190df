package libsvm;

public interface svm_print_interface {
  void print(String s);
}
